package graft.llm

import graft.text.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document n-gram novelty against a reference corpus — the GRADED
  * sibling of [[Decontaminate]] (which answers a binary "does this doc
  * overlap the benchmark ≥ k grams"): what FRACTION of a document's
  * distinct n-grams has the reference never seen? The curation signal
  * behind "is this batch new material or a rehash" (crawl refresh triage,
  * paying for a feed twice — the per-document face of
  * [[graft.text.SourceOverlap]]'s per-feed matrix) and the memorization-
  * risk screen (a doc that is 95% known n-grams adds little and
  * over-weights what's already trained on).
  *
  * Scale shape: when the reference is benchmark-sized, its distinct gram
  * set broadcasts and the whole score is scan-stage (the Decontaminate
  * posture); against a corpus-sized reference the join shuffles on the
  * 8-byte gram hash — per-doc gram lists are doc-bounded, and the
  * reference side is distinct-reduced (partial-agg'd) before it moves.
  * Known-gram counts ride the same one per-doc aggregate either way.
  */
object Novelty {

  val Scale = 1000000L

  /** (idCol, n_grams, n_known, novelty_scaled) per document:
    * `n_grams` = the doc's DISTINCT n-gram count, `n_known` = how many
    * appear in the reference's distinct gram set,
    * `novelty_scaled` = ⌊SCALE·(n_grams − n_known)/n_grams⌋.
    * A sub-n-token document contributes its whole text as one gram
    * (the [[graft.text.TextFunctions.shingleSet]] contract), so
    * `n_grams ≥ 1` and the ratio is always defined.
    */
  def noveltyScores(docs: DataFrame, ref: DataFrame, idCol: String,
                    textCol: String, refTextCol: String, n: Int = 3,
                    broadcastRef: Boolean = true): DataFrame = {
    val dg = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), explode(shingleSet(col(textCol), n)).as("__g"))
      .select(col(idCol), hash60(col("__g")).as("__h"))
    val rg0 = ref
      .where(col(refTextCol).isNotNull)
      .select(explode(shingleSet(col(refTextCol), n)).as("__rg"))
      .select(hash60(col("__rg")).as("__rh"))
      .distinct()
    val rg = if (broadcastRef) broadcast(rg0) else rg0
    dg.join(rg, col("__h") === col("__rh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__rh")).as("n_known"))
      .withColumn("novelty_scaled",
        expr(s"((n_grams - n_known) * $Scale) div n_grams"))
  }

  /** DuckDB replay of [[noveltyScores]] — the shared shingle-CTE shape,
    * same 60-bit hash-membership contract, same floor division
    * (non-negative operands).
    */
  def noveltyOracle(docsTable: String, refSql: String, idCol: String,
                    textCol: String, refTextCol: String, n: Int = 3): String = {
    val shingleExpr = (0 until n).map(j => s"t[i+$j]").mkString("||' '||")
    def setSql(src: String, text: String) =
      s"""SELECT *, list_distinct(CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
  ELSE list_transform(generate_series(1, len(t)-${n - 1}), i -> $shingleExpr) END) AS s
  FROM (SELECT *, string_split($text, ' ') AS t FROM $src)"""
    s"""WITH dg AS (SELECT $idCol, CAST(('0x'||substr(md5(g),1,15)) AS BIGINT) AS h
  FROM (SELECT $idCol, unnest(s) AS g FROM (${setSql(
        s"(SELECT * FROM $docsTable WHERE $idCol IS NOT NULL AND $textCol IS NOT NULL)",
        textCol)}))),
rg AS (SELECT DISTINCT CAST(('0x'||substr(md5(g),1,15)) AS BIGINT) AS rh
  FROM (SELECT unnest(s) AS g FROM (${setSql(
        s"(SELECT * FROM ($refSql) WHERE $refTextCol IS NOT NULL)", refTextCol)}))),
c AS (SELECT dg.$idCol, CAST(count(*) AS BIGINT) AS n_grams,
    CAST(count(rg.rh) AS BIGINT) AS n_known
  FROM dg LEFT JOIN rg ON dg.h = rg.rh GROUP BY 1)
SELECT $idCol, n_grams, n_known,
  CAST(((n_grams - n_known) * $Scale) // n_grams AS BIGINT) AS novelty_scaled
FROM c ORDER BY $idCol""".stripMargin
  }
}
