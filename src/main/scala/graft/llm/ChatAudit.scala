package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chat-transcript schema audit — SFT/RLHF data validation: a fine-tune
  * corpus is JSON conversations, and a malformed one (roles out of
  * order, empty turns, system prompt mid-conversation, truncated JSON)
  * poisons training silently because tokenizers happily encode garbage.
  * Per row, the structural facts a curation gate filters on:
  *
  *   - parse_ok: valid JSON array with ≥ 1 turn (anything else is a
  *     parse failure; the other columns are NULL then — "unknown", not
  *     "fine");
  *   - n_turns, total_chars (content lengths, exact);
  *   - roles_ok: every role ∈ {system, user, assistant};
  *   - sys_ok: `system` appears only at position 0 (where it is
  *     optional);
  *   - alt_ok: after the optional leading system, roles strictly
  *     alternate user, assistant, user, …;
  *   - ends_ok: the last turn is the assistant's (a trailing user turn
  *     trains nothing);
  *   - n_empty: turns whose content trims to empty.
  *
  * All scan-stage JSON + array arithmetic over each row's own turns —
  * zero shuffle, zero state; aggregate downstream as you would any
  * flag table. The JSON walk follows the L95 discipline (parse cost
  * inside the codegen'd scan; the parsed array lands as ONE column and
  * every audit reads attributes, never re-parses).
  */
object ChatAudit {

  private val TurnSchema = "array<struct<role: string, content: string>>"

  /** (idCol, parse_ok, n_turns, roles_ok, sys_ok, alt_ok, ends_ok,
    * n_empty, total_chars).
    */
  def audit(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val parsed = df
      .where(col(idCol).isNotNull)
      .select(col(idCol), from_json(col(jsonCol),
        org.apache.spark.sql.types.DataType.fromDDL(TurnSchema)).as("__t"))
    val ok = col("__t").isNotNull && size(col("__t")) >= 1
    val role = (t: org.apache.spark.sql.Column) => t.getField("role")
    val content = (t: org.apache.spark.sql.Column) =>
      coalesce(t.getField("content"), lit(""))
    val off = when(role(element_at(col("__t"), 1)) === "system", 1)
      .otherwise(0)
    val rest = slice(col("__t"), off + 1, size(col("__t")) - off)
    parsed.select(col(idCol),
      ok.as("parse_ok"),
      when(ok, size(col("__t")).cast("long")).as("n_turns"),
      when(ok, forall(col("__t"), t =>
        role(t).isNotNull && role(t).isin("system", "user", "assistant")))
        .as("roles_ok"),
      when(ok, size(filter(
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        t => role(t) <=> "system")) === 0).as("sys_ok"),
      when(ok, forall(transform(rest, (t, i) =>
        role(t) <=> when(i % 2 === 0, "user").otherwise("assistant")),
        b => b)).as("alt_ok"),
      when(ok, role(element_at(col("__t"), -1)) <=> "assistant")
        .as("ends_ok"),
      when(ok, size(filter(col("__t"), t => trim(content(t)) === ""))
        .cast("long")).as("n_empty"),
      when(ok, aggregate(col("__t"), lit(0L),
        (a, t) => a + length(content(t)))).as("total_chars"))
  }

  /** DuckDB replay of [[audit]] — json_valid/json_type guards, the same
    * per-turn walks as list lambdas over the turn index range.
    */
  def oracleSql(table: String, idCol: String, jsonSql: String): String = {
    val j = "CAST(js AS JSON)"
    def r(i: String) = s"json_extract_string($j, '$$[' || ($i) || '].role')"
    def c(i: String) =
      s"coalesce(json_extract_string($j, '$$[' || ($i) || '].content'), '')"
    val n = s"CAST(json_array_length($j) AS BIGINT)"
    s"""WITH src AS (SELECT $idCol AS id, $jsonSql AS js FROM $table
  WHERE $idCol IS NOT NULL),
b AS (SELECT id, js,
    CASE WHEN json_valid(js)
         THEN json_type($j) = 'ARRAY' AND $n >= 1
         ELSE FALSE END AS ok
  FROM src)
SELECT id AS $idCol, ok AS parse_ok,
  CASE WHEN ok THEN CAST($n AS BIGINT) END AS n_turns,
  CASE WHEN ok THEN list_aggregate(list_transform(range(0, $n),
    i -> coalesce(${r("i")} IN ('system', 'user', 'assistant'), FALSE)),
    'bool_and')
  END AS roles_ok,
  CASE WHEN ok THEN coalesce(list_aggregate(list_transform(range(1, $n),
    i -> ${r("i")} IS DISTINCT FROM 'system'), 'bool_and'), TRUE)
  END AS sys_ok,
  CASE WHEN ok THEN coalesce(list_aggregate(list_transform(
    range(CAST(CASE WHEN ${r("0")} = 'system' THEN 1 ELSE 0 END AS BIGINT), $n),
    i -> ${r("i")} IS NOT DISTINCT FROM
      (CASE WHEN (i - (CASE WHEN ${r("0")} = 'system' THEN 1 ELSE 0 END))
              % 2 = 0 THEN 'user' ELSE 'assistant' END)), 'bool_and'), TRUE)
  END AS alt_ok,
  CASE WHEN ok THEN ${r(s"$n - 1")} IS NOT DISTINCT FROM 'assistant'
  END AS ends_ok,
  CASE WHEN ok THEN CAST(coalesce(list_sum(list_transform(range(0, $n),
    i -> CASE WHEN trim(${c("i")}) = '' THEN 1 ELSE 0 END)), 0) AS BIGINT)
  END AS n_empty,
  CASE WHEN ok THEN CAST(coalesce(list_sum(list_transform(range(0, $n),
    i -> length(${c("i")}))), 0) AS BIGINT)
  END AS total_chars
FROM b ORDER BY id"""
  }
}
