package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-query retrieval metrics — precision@k, recall@k and reciprocal
  * rank against a relevance set: the evaluation loop a RAG / search
  * pipeline runs before trusting its own retriever ([[graft.llm.AnnRecall]]
  * measures the ANN index against brute force; this measures the
  * RANKING against human/ground-truth relevance — different questions,
  * both belong in the eval layer).
  *
  * Ranks derive from the score with a DETERMINISTIC tiebreak
  * (score DESC, doc ASC via row_number) so the cut at k is
  * engine-replayable — a bare `rank()` under score ties would make
  * "top k" ambiguous exactly where it matters. All metrics are exact
  * 1e−6-unit integers, one truncating division each on non-negatives:
  *
  *   precision_q6 = ⌊10⁶·hits/k⌋          (k the DECLARED cutoff —
  *     the IR convention; a query returning fewer than k rows is
  *     penalized, not renormalized)
  *   recall_q6    = ⌊10⁶·hits/n_rel⌋      (NULL when the query has no
  *     relevant docs — recall of nothing is undefined)
  *   rr_q6        = ⌊10⁶/first_hit_rank⌋  (0 when no hit in the top k
  *     — the MRR convention scores a miss as zero, not missing)
  *
  * Scale shape: one rank window per query (queries are many and small
  * — the healthy side of the rank posture), one equi-join against the
  * distinct relevance set on (query, doc), one partial-agg'd per-query
  * aggregate; everything after the window is hits-sized.
  *
  * Contracts: (query, doc) should be unique in `results` (duplicates
  * rank as distinct rows identically on both engines, but the metric
  * stops being precision); NULL query/doc/score rows drop; relevance
  * rows deduplicate; queries with no result rows are ABSENT (the
  * operator evaluates a retrieval run — a query the run never answered
  * needs the run fixed, not a fabricated zero row).
  */
object RetrievalMetrics {

  val Scale = 1000000L

  /** (query, n_ret, n_rel, hits, precision_q6, recall_q6, rr_q6) at the
    * declared cutoff k.
    */
  def atK(results: DataFrame, queryCol: String, docCol: String,
          scoreCol: String, relevant: DataFrame, rQueryCol: String,
          rDocCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val rel = relevant
      .where(col(rQueryCol).isNotNull && col(rDocCol).isNotNull)
      .select(col(rQueryCol).as("__rq"), col(rDocCol).as("__rd"))
      .distinct()
      .localCheckpoint(true)
    val nRel = rel.groupBy(col("__rq").as("__nq"))
      .agg(count(lit(1)).as("__nrel"))
    val ranked = results
      .where(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(scoreCol).isNotNull)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col(scoreCol).desc, col(docCol).asc)))
      .where(col("__rk") <= k)
    val flagged = ranked
      .join(rel, col(queryCol) === col("__rq") && col(docCol) === col("__rd"),
        "left_outer")
      .withColumn("__hit", col("__rd").isNotNull.cast("long"))
    flagged.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_ret"),
        sum(col("__hit")).as("hits"),
        min(when(col("__hit") === 1L, col("__rk"))).as("__first"))
      .join(nRel, col(queryCol) === col("__nq"), "left_outer")
      .select(col(queryCol),
        col("n_ret"),
        coalesce(col("__nrel"), lit(0L)).as("n_rel"),
        col("hits"),
        call_function("div", col("hits") * Scale, lit(k.toLong))
          .as("precision_q6"),
        when(col("__nrel").isNull, lit(null).cast("long"))
          .otherwise(call_function("div", col("hits") * Scale, col("__nrel")))
          .as("recall_q6"),
        coalesce(call_function("div", lit(Scale), col("__first").cast("long")),
          lit(0L)).as("rr_q6"))
  }

  /** DuckDB replay of [[atK]] — same deterministic rank, same
    * truncating divisions on non-negatives.
    */
  def oracleSql(resultsSql: String, queryCol: String, docCol: String,
                scoreCol: String, relevantSql: String, rQueryCol: String,
                rDocCol: String, k: Int): String =
    s"""WITH rel AS (
  SELECT DISTINCT $rQueryCol AS rq, $rDocCol AS rd FROM ($relevantSql)
  WHERE $rQueryCol IS NOT NULL AND $rDocCol IS NOT NULL),
nrel AS (SELECT rq, count(*) AS nr FROM rel GROUP BY rq),
ranked AS (
  SELECT $queryCol AS q, $docCol AS d,
    row_number() OVER (PARTITION BY $queryCol
      ORDER BY $scoreCol DESC, $docCol ASC) AS rk
  FROM ($resultsSql)
  WHERE $queryCol IS NOT NULL AND $docCol IS NOT NULL
    AND $scoreCol IS NOT NULL),
flagged AS (
  SELECT r.q, r.rk, CASE WHEN rel.rd IS NULL THEN 0 ELSE 1 END AS hit
  FROM (SELECT * FROM ranked WHERE rk <= $k) r
  LEFT JOIN rel ON r.q = rel.rq AND r.d = rel.rd),
perq AS (
  SELECT q, CAST(count(*) AS BIGINT) AS n_ret,
    CAST(sum(hit) AS BIGINT) AS hits,
    min(CASE WHEN hit = 1 THEN rk END) AS first_hit
  FROM flagged GROUP BY q)
SELECT q AS $queryCol, n_ret, CAST(coalesce(nr, 0) AS BIGINT) AS n_rel, hits,
  CAST((hits * $Scale) // $k AS BIGINT) AS precision_q6,
  CASE WHEN nr IS NULL THEN NULL
       ELSE CAST((hits * $Scale) // nr AS BIGINT) END AS recall_q6,
  CAST(coalesce($Scale // first_hit, 0) AS BIGINT) AS rr_q6
FROM perq LEFT JOIN nrel ON perq.q = nrel.rq
ORDER BY 1"""
}
