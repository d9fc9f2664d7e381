package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the compliance pass every training-data
  * pipeline runs before anything ships: count pattern hits per document
  * (audit / filtering signal) and rewrite the text with typed
  * placeholders (the redacted corpus). Pure scan-stage regex work — zero
  * shuffle, zero aggregation state, codegen'd `RLIKE`/`regexp_*`
  * expressions — so the pass costs one corpus read at any scale and
  * composes with every other per-document operator in the same stage.
  *
  * Patterns are deliberately ENGINE-PORTABLE: no lookarounds, no
  * backreferences, leftmost non-overlapping matching — the subset where
  * Java regex (Spark) and RE2 (DuckDB) agree — which is what makes the
  * counts and the redacted text oracle-checkable bit-for-bit. They are
  * also deliberately conservative (high precision over recall): a
  * compliance pipeline tunes patterns per jurisdiction; the OPERATOR
  * contract here is the plumbing — counts + ordered redaction — not a
  * legal definition of PII.
  *
  * Relationship to [[CorpusFilters.scrubPii]]: that is the inline
  * corpus-clean scrub (URL/email/phone → one generic pass, used inside
  * the pipeline gates); THIS is the audit-grade surface — typed per-
  * category counts (the policy-thresholdable frame) plus IPv4 and
  * SSN-shaped ids, with a documented rule order. Both share the same
  * engine-portable pattern discipline.
  *
  * Reference scope note: fabrix has no text operators — LLM-pipeline
  * extension surface (SURVEY §2.11).
  */
object Pii {

  /** username@host.tld — requires a dotted TLD of 2+ letters. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — 999.0.0.1 matches; precision comes
    * from the word boundaries, octet-range checks don't regex portably).
    */
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-prefixed phone: +CC sep groups (the unambiguous form;
    * bare 10-digit runs collide with ids/timestamps too often to redact).
    */
  val PhonePat = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}(?:[- ]\\d{3,4})?"

  /** US-SSN-shaped 3-2-4 digit id. */
  val IdNumPat = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Redaction order: ids before phones (a phone tail can contain a
    * 3-4 digit group, never a full 3-2-4 id — but an id inside a longer
    * digit run must win while it is still intact), emails before IPv4
    * (a dotted-quad can appear inside an email host).
    */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", EmailPat, "[EMAIL]"),
    ("ipv4", Ipv4Pat, "[IP]"),
    ("id_num", IdNumPat, "[ID]"),
    ("phone", PhonePat, "[PHONE]"))

  /** Per-document hit counts: (idCol, n_email, n_ipv4, n_id_num, n_phone,
    * n_pii) — the audit frame (filter on `n_pii > 0`, aggregate per
    * source for the data card). Rows with NULL id/text are dropped (the
    * standard rankability contract).
    */
  def piiCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = Rules.map { case (name, pat, _) =>
      size(regexp_extract_all(t, lit(pat), lit(0))).cast("long").as(s"n_$name")
    }
    df.where(col(idCol).isNotNull && t.isNotNull)
      .select((col(idCol) +: counts): _*)
      .withColumn("n_pii",
        Rules.map(r => col(s"n_${r._1}")).reduce(_ + _))
  }

  /** The text with every rule's matches replaced by its typed placeholder,
    * in [[Rules]] order (order matters — see the Rules doc). NULL text
    * stays NULL; all other columns ride through unchanged.
    */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }

  /** (idCol, redacted text) for every non-NULL-id row. */
  def redactDocs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.where(col(idCol).isNotNull)
      .select(col(idCol), redact(col(textCol)).as(textCol))

  /** DuckDB replay of [[piiCounts]] over an arbitrary text expression
    * (RE2 and Java regex agree on this pattern subset; `regexp_extract_all`
    * is non-overlapping leftmost in both).
    */
  def countsOracle(table: String, idCol: String, textSql: String): String = {
    val cols = Rules.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all($textSql, '${sqlEscape(pat)}')) AS BIGINT) AS n_$name"
    }.mkString(",\n  ")
    val total = Rules.map(r => s"n_${r._1}").mkString(" + ")
    s"""WITH c AS (SELECT $idCol,
  $cols
FROM $table WHERE $idCol IS NOT NULL AND ($textSql) IS NOT NULL)
SELECT $idCol, ${Rules.map(r => s"n_${r._1}").mkString(", ")},
  CAST($total AS BIGINT) AS n_pii
FROM c ORDER BY $idCol"""
  }

  /** DuckDB replay of [[redactDocs]] (the 'g' flag matches Spark's
    * replace-all default; same rule order).
    */
  def redactOracle(table: String, idCol: String, textSql: String,
                   textAlias: String): String = {
    val expr = Rules.foldLeft(textSql) { case (e, (_, pat, repl)) =>
      s"regexp_replace($e, '${sqlEscape(pat)}', '$repl', 'g')"
    }
    s"SELECT $idCol, $expr AS $textAlias FROM $table " +
      s"WHERE $idCol IS NOT NULL ORDER BY $idCol"
  }

  private def sqlEscape(pat: String): String = pat.replace("'", "''")
}
