package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Readability scoring — the Flesch Reading Ease family computed with
  * exact integer arithmetic: a corpus-quality lens orthogonal to the
  * length/stopword screens ([[CorpusFilters]]) and the LM perplexity
  * proxy ([[UnigramLm]]) — academic-dense text and see-spot-run text can
  * carry identical stopword ratios yet opposite training value.
  *
  * Counting is regex-portable (Java ∩ RE2, no lookarounds): words are
  * maximal `[a-z]+` runs of the lowercased text, syllables are maximal
  * `[aeiouy]+` vowel runs (the standard first-order heuristic — silent
  * final e and diphthong splits are not modeled, documented), sentences
  * are maximal `[.!?]+` terminator runs with a floor of one (a fragment
  * is one sentence). Each count collapses runs to a single marker char
  * that `lower()` guarantees cannot otherwise survive (`W`/`V`/`S` are
  * uppercase) and takes a length difference — scan-stage, no explode, no
  * per-word rows.
  *
  * The score stays integral: Flesch = 206.835 − 1.015·(w/s) −
  * 84.6·(syl/w), published in centi-units as
  * `20684 − (203·w) div (2·s) − (8460·syl) div w` — every operand
  * non-negative, so truncating div IS floor on both engines. NULL when
  * the text has no words (no score exists), mirroring the oracle.
  */
object Readability {

  /** Count of maximal runs matching `runClass` in `lo`, via the marker
    * collapse `length(x) − length(remove(marker))`.
    */
  private def runs(lo: Column, runClass: String, marker: String): Column =
    length(regexp_replace(lo, runClass, marker)) -
      length(translate(regexp_replace(lo, runClass, marker), marker, ""))

  /** (idCol, words, sentences, syllables, flesch_centi) per row. NULL
    * text yields zero counts and a NULL score.
    */
  def flesch(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lo = lower(col(textCol))
    df.select(col(idCol),
        coalesce(runs(lo, "[a-z]+", "W"), lit(0L)).cast("long").as("words"),
        greatest(coalesce(runs(lo, "[.!?]+", "S"), lit(0L)), lit(1))
          .cast("long").as("sentences"),
        coalesce(runs(lo, "[aeiouy]+", "V"), lit(0L)).cast("long")
          .as("syllables"))
      .withColumn("flesch_centi",
        when(col("words") > 0,
          lit(20684L) - expr("(203 * words) div (2 * sentences)") -
            expr("(8460 * syllables) div words")).cast("long"))
  }

  /** DuckDB replay of [[flesch]] — same marker-collapse counts (DuckDB
    * regexp_replace needs the explicit 'g' flag to match Spark's
    * replace-all default).
    */
  def oracleSql(table: String, idCol: String, textCol: String): String = {
    def runsSql(cls: String, m: String) =
      s"length(regexp_replace(lower($textCol), '$cls', '$m', 'g')) - " +
        s"length(replace(regexp_replace(lower($textCol), '$cls', '$m', 'g'), '$m', ''))"
    s"""WITH c AS (
  SELECT $idCol,
    CAST(coalesce(${runsSql("[a-z]+", "W")}, 0) AS BIGINT) AS words,
    CAST(greatest(coalesce(${runsSql("[.!?]+", "S")}, 0), 1) AS BIGINT) AS sentences,
    CAST(coalesce(${runsSql("[aeiouy]+", "V")}, 0) AS BIGINT) AS syllables
  FROM $table)
SELECT $idCol, words, sentences, syllables,
  CAST(CASE WHEN words > 0 THEN 20684 - (203 * words) // (2 * sentences)
    - (8460 * syllables) // words END AS BIGINT) AS flesch_centi
FROM c ORDER BY $idCol""".stripMargin
  }
}
