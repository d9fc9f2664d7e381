package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-weighted corpus mixing — the pretraining recipe math:
  * sampling a multi-source corpus proportional to size drowns the small
  * sources, uniform over-samples them into memorization, so production
  * mixes sample source i with p_i ∝ tokens_i^α (α = 1/T ∈ (0, 1]; the
  * multilingual/mixture convention — α = 1 is proportional, α → 0 is
  * uniform). This operator turns a declared (α, token budget) into the
  * per-source audit a data lead signs off on: the weight, the expected
  * token draw, and the EPOCHS number — expected/available, the
  * repetition-risk readout (epochs > 1 means the budget re-reads the
  * source; the classical "how many times does Wikipedia repeat" table).
  *
  * Determinism discipline: tokens^α is ONE declared double chain per
  * source — ⌊10⁶·exp((a/d)·ln(tokens))⌋ — quantized IMMEDIATELY, and
  * every cross-source number after that is exact integer arithmetic on
  * the quantized values (weights and draws divide by Σraw_q6, a sum of
  * longs — no float accumulation across sources, so engine/partitioning
  * summation order can't shift a hash). DECIMAL(38,0) windows hold
  * budget·raw_q6 up to ~10²⁶.
  *
  * Scale shape: one partial-agg'd per-source collapse (source-sized
  * output), one 1-row total broadcast back. NULL source is a real
  * stratum; NULL/negative token counts drop/raise; sources with zero
  * tokens carry zero weight (ln is never taken — spec-pinned).
  */
object TemperatureMix {

  val Scale = 1000000L

  /** One row per source: (sourceCol, n_docs, tokens, raw_q6, weight_q6,
    * draw_tokens, epochs_q6).
    */
  def mix(df: DataFrame, sourceCol: String, tokensCol: String,
          alphaNum: Long, alphaDen: Long, tokenBudget: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum <= alphaDen,
      s"alpha = $alphaNum/$alphaDen must lie in (0, 1]")
    require(tokenBudget >= 1, s"tokenBudget must be positive, got $tokenBudget")
    graft.Guards.requireIntegral(df, tokensCol, "temperatureMix")
    val dec = "decimal(38,0)"
    val perSource = df
      .where(col(tokensCol).isNotNull)
      .select(col(sourceCol),
        when(col(tokensCol).cast("long") < 0L, raise_error(concat(
          lit("temperatureMix: negative token count "),
          col(tokensCol).cast("string"))).cast("long"))
          .otherwise(col(tokensCol).cast("long")).as("__tok"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("tokens"))
      .withColumn("raw_q6",
        when(col("tokens") > 0L,
          floor(lit(Scale.toDouble) *
            exp(lit(alphaNum.toDouble / alphaDen.toDouble) *
              log(col("tokens").cast("double")))).cast("long"))
          .otherwise(lit(0L)))
    val total = perSource.agg(sum(col("raw_q6")).as("__traw"))
    def div(num: Column, den: Column): Column =
      call_function("div", num, den)
    val draw = when(col("__traw") > 0L,
      div(col("raw_q6").cast(dec) * tokenBudget, col("__traw").cast(dec)))
      .otherwise(lit(0L).cast(dec))
    perSource.crossJoin(broadcast(total))
      .select(col(sourceCol), col("n_docs"), col("tokens"), col("raw_q6"),
        when(col("__traw") > 0L,
          div(col("raw_q6").cast(dec) * Scale, col("__traw").cast(dec))
            .cast("long")).otherwise(lit(0L)).as("weight_q6"),
        draw.cast("long").as("draw_tokens"),
        when(col("tokens") > 0L,
          div(draw * Scale, col("tokens").cast(dec)).cast("long"))
          .otherwise(lit(null).cast("long")).as("epochs_q6"))
  }

  /** DuckDB replay of [[mix]]; `docsSql` yields (src, tok). */
  def oracleSql(docsSql: String, sourceName: String, alphaNum: Long,
                alphaDen: Long, tokenBudget: Long): String = {
    val alpha = s"(CAST($alphaNum AS DOUBLE) / $alphaDen)"
    s"""WITH per AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(tok) AS BIGINT) AS tokens
  FROM ($docsSql) WHERE tok IS NOT NULL GROUP BY src),
raw AS (
  SELECT src, n_docs, tokens,
    CASE WHEN tokens > 0
      THEN CAST(floor($Scale.0 * exp($alpha * ln(CAST(tokens AS DOUBLE))))
        AS BIGINT)
      ELSE 0 END AS raw_q6
  FROM per),
tot AS (SELECT sum(raw_q6) AS traw FROM raw)
SELECT src AS $sourceName, n_docs, tokens, raw_q6,
  CASE WHEN traw > 0
    THEN CAST((CAST(raw_q6 AS HUGEINT) * $Scale) // traw AS BIGINT)
    ELSE 0 END AS weight_q6,
  CASE WHEN traw > 0
    THEN CAST((CAST(raw_q6 AS HUGEINT) * $tokenBudget) // traw AS BIGINT)
    ELSE 0 END AS draw_tokens,
  CASE WHEN tokens > 0 THEN CAST(
    ((CASE WHEN traw > 0
       THEN (CAST(raw_q6 AS HUGEINT) * $tokenBudget) // traw
       ELSE 0 END) * $Scale) // tokens AS BIGINT) END AS epochs_q6
FROM raw, tot
ORDER BY $sourceName"""
  }
}
