package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-distribution drift between two corpus slices — the TEXT face of
  * [[graft.operators.Drift]]'s numeric PSI: has the language moved
  * between the reference corpus and the incoming batch (new crawl, new
  * vendor, new month)? Buckets are a BOUNDED vocabulary — the reference
  * slice's top-V tokens by (count desc, token asc), the
  * [[UnigramLm]] determinism rule — plus one `<oov>` bucket absorbing
  * the tail, so the drift table is V+1 rows whatever the corpus size and
  * the PSI math is exactly [[graft.operators.Drift.psiFromCounts]]
  * (shared implementation — the quantized-ln discipline cannot drift
  * between the numeric and text gates).
  *
  * Scale shape: two partial-agg'd word-count aggregates (a stopword is
  * one hot counter absorbed map-side, the Collocations posture); the
  * vocabulary cut is TakeOrderedAndProject over the vocabulary-sized
  * count table and broadcasts; bucketizing is a broadcast join on the
  * count tables (vocabulary-sized, never corpus rows).
  */
object VocabDrift {

  val Oov = "<oov>"

  private def wordCounts(df: DataFrame, textCol: String, out: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as(out))

  /** (bucket, n_ref, n_cur, psi_q) over the reference top-`vocabSize`
    * tokens plus `<oov>`; `psi_q` is ⌊10⁶·(p−q)·ln(p/q)⌋, NULL when a
    * side is empty (the Drift contract).
    */
  def vocabDrift(ref: DataFrame, cur: DataFrame, textCol: String,
                 vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    // the ref counts feed both the vocabulary cut and the bucketing —
    // checkpoint the vocabulary-sized table instead of re-scanning ref
    val rc = wordCounts(ref, textCol, "n_ref").localCheckpoint(true)
    val cc = wordCounts(cur, textCol, "n_cur")
    val vocab = broadcast(
      rc.orderBy(col("n_ref").desc, col("__w").asc).limit(vocabSize)
        .select(col("__w").as("__v")))
    def bucketize(c: DataFrame, out: String) = c
      .join(vocab, col("__w") === col("__v"), "left")
      .select(when(col("__v").isNotNull, col("__w")).otherwise(lit(Oov)).as("bucket"),
        col(out))
      .groupBy(col("bucket")).agg(sum(col(out)).as(out))
    graft.operators.Drift.psiFromCounts(
      bucketize(rc, "n_ref"), bucketize(cc, "n_cur"))
  }

  /** DuckDB replay of [[vocabDrift]] — same tokenization, same
    * deterministic vocabulary cut, same Drift double chain and quantized
    * ln (mirrors [[graft.operators.Drift.oracleSql]]'s final stage).
    */
  def vocabDriftOracle(refSql: String, curSql: String, textCol: String,
                       vocabSize: Int): String = {
    val scale = 1000000L
    def counts(src: String) =
      s"""SELECT w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split($textCol, ' ')) AS w
    FROM ($src) WHERE $textCol IS NOT NULL) GROUP BY 1"""
    s"""WITH rc AS (${counts(refSql)}),
cc AS (${counts(curSql)}),
vocab AS (SELECT w FROM rc ORDER BY n DESC, w ASC LIMIT $vocabSize),
rb AS (SELECT CASE WHEN w IN (SELECT w FROM vocab) THEN w ELSE '$Oov' END AS bucket,
    CAST(sum(n) AS BIGINT) AS n_ref FROM rc GROUP BY 1),
cb AS (SELECT CASE WHEN w IN (SELECT w FROM vocab) THEN w ELSE '$Oov' END AS bucket,
    CAST(sum(n) AS BIGINT) AS n_cur FROM cc GROUP BY 1),
nt AS (SELECT (SELECT CAST(coalesce(sum(n_ref), 0) AS BIGINT) FROM rb) AS N,
              (SELECT CAST(coalesce(sum(n_cur), 0) AS BIGINT) FROM cb) AS M)
SELECT coalesce(rb.bucket, cb.bucket) AS bucket,
  coalesce(rb.n_ref, 0) AS n_ref, coalesce(cb.n_cur, 0) AS n_cur,
  CASE WHEN coalesce(rb.n_ref, 0) > 0 AND coalesce(cb.n_cur, 0) > 0 THEN
    CAST(floor($scale.0 * (
      (CAST(rb.n_ref AS DOUBLE) / CAST(nt.N AS DOUBLE)
        - CAST(cb.n_cur AS DOUBLE) / CAST(nt.M AS DOUBLE))
      * ln((CAST(rb.n_ref AS DOUBLE) * CAST(nt.M AS DOUBLE))
        / (CAST(cb.n_cur AS DOUBLE) * CAST(nt.N AS DOUBLE))))) AS BIGINT)
  END AS psi_q
FROM rb FULL OUTER JOIN cb ON rb.bucket = cb.bucket, nt
ORDER BY 1""".stripMargin
  }
}
