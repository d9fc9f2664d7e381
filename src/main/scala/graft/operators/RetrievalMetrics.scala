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

  /** Graded NDCG@k with PER-TERM quantization — the order-sensitive
    * sibling of [[atK]] (precision counts hits; NDCG asks whether the
    * best docs came FIRST). The log2 discount is irrational, so each
    * rank's contribution quantizes independently:
    *
    *   term(rel, rk) = ⌊10⁶·rel·ln2 / ln(rk+1)⌋   (the [[Drift]]
    *     quantized-ln discipline: an IDENTICAL per-row double chain on
    *     both engines, floored per row — never a cross-row double sum,
    *     which would be accumulation-order-dependent)
    *   dcg_q6  = Σ terms over the retrieved top k (unjudged docs gain 0)
    *   idcg_q6 = Σ terms over the query's judged docs sorted rel DESC,
    *     cut at k — the ideal ordering of what COULD have been returned
    *   ndcg_q6 = ⌊10⁶·dcg_q6/idcg_q6⌋, NULL when the query has no
    *     positive judgment (perfection over nothing is undefined)
    *
    * The integer sums and final division are exact; the quantization
    * is declared semantics (term-floored DCG), not an approximation of
    * float DCG that engines could disagree on.
    *
    * Contracts: graded relevance must be ≥ 0 (negative grades fail the
    * plan loudly); duplicate (query, doc) judgments collapse to their
    * MAX grade; rank ties cut by doc ASC as in [[atK]].
    */
  def ndcgAtK(results: DataFrame, queryCol: String, docCol: String,
              scoreCol: String, judged: DataFrame, jQueryCol: String,
              jDocCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val relGuard = when(col(relCol) < 0,
        raise_error(concat(lit("ndcgAtK: negative relevance grade "),
          col(relCol).cast("string"))))
      .otherwise(col(relCol)).cast("long")
    val rel = judged
      .where(col(jQueryCol).isNotNull && col(jDocCol).isNotNull &&
        col(relCol).isNotNull)
      .select(col(jQueryCol).as("__rq"), col(jDocCol).as("__rd"),
        relGuard.as("__rel"))
      .groupBy(col("__rq"), col("__rd")).agg(max(col("__rel")).as("__rel"))
      .localCheckpoint(true)
    def term(relC: org.apache.spark.sql.Column, rkC: org.apache.spark.sql.Column) =
      when(relC > 0,
        floor((lit(Scale.toDouble) * relC.cast("double") * log(lit(2.0))) /
          log(rkC.cast("double") + 1)).cast("long"))
        .otherwise(lit(0L))
    val ranked = results
      .where(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(scoreCol).isNotNull)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col(scoreCol).desc, col(docCol).asc)))
      .where(col("__rk") <= k)
    val dcg = ranked
      .join(rel, col(queryCol) === col("__rq") && col(docCol) === col("__rd"),
        "left_outer")
      .groupBy(col(queryCol))
      .agg(sum(term(coalesce(col("__rel"), lit(0L)), col("__rk")))
        .as("dcg_q6"))
    val ideal = rel
      .withColumn("__irk", row_number().over(
        Window.partitionBy(col("__rq"))
          .orderBy(col("__rel").desc, col("__rd").asc)))
      .where(col("__irk") <= k)
      .groupBy(col("__rq"))
      .agg(sum(term(col("__rel"), col("__irk"))).as("idcg_q6"))
    dcg.join(ideal, col(queryCol) === col("__rq"), "left_outer")
      .select(col(queryCol),
        col("dcg_q6"),
        coalesce(col("idcg_q6"), lit(0L)).as("idcg_q6"),
        when(coalesce(col("idcg_q6"), lit(0L)) === 0L, lit(null).cast("long"))
          .otherwise(call_function("div", col("dcg_q6") * Scale,
            col("idcg_q6")))
          .as("ndcg_q6"))
  }

  /** DuckDB replay of [[ndcgAtK]] — the same per-term quantized chain. */
  def ndcgOracleSql(resultsSql: String, queryCol: String, docCol: String,
                    scoreCol: String, judgedSql: String, jQueryCol: String,
                    jDocCol: String, relCol: String, k: Int): String = {
    def term(relSql: String, rkSql: String) =
      s"""CASE WHEN $relSql > 0 THEN CAST(floor((($Scale.0 * $relSql) * ln(2))
        / ln($rkSql + 1)) AS BIGINT) ELSE 0 END"""
    s"""WITH rel AS (
  SELECT $jQueryCol AS rq, $jDocCol AS rd, CAST(max($relCol) AS BIGINT) AS rel
  FROM ($judgedSql)
  WHERE $jQueryCol IS NOT NULL AND $jDocCol IS NOT NULL
    AND $relCol IS NOT NULL
  GROUP BY 1, 2),
ranked AS (
  SELECT $queryCol AS q, $docCol AS d,
    row_number() OVER (PARTITION BY $queryCol
      ORDER BY $scoreCol DESC, $docCol ASC) AS rk
  FROM ($resultsSql)
  WHERE $queryCol IS NOT NULL AND $docCol IS NOT NULL
    AND $scoreCol IS NOT NULL),
dcg AS (
  SELECT r.q, CAST(sum(${term("coalesce(rel.rel, 0)", "r.rk")}) AS BIGINT)
    AS dcg_q6
  FROM (SELECT * FROM ranked WHERE rk <= $k) r
  LEFT JOIN rel ON r.q = rel.rq AND r.d = rel.rd
  GROUP BY r.q),
ideal AS (
  SELECT rq, CAST(sum(${term("rel", "irk")}) AS BIGINT) AS idcg_q6
  FROM (SELECT rq, rel,
          row_number() OVER (PARTITION BY rq ORDER BY rel DESC, rd ASC)
            AS irk
        FROM rel) i
  WHERE irk <= $k GROUP BY rq)
SELECT dcg.q AS $queryCol, dcg_q6,
  CAST(coalesce(idcg_q6, 0) AS BIGINT) AS idcg_q6,
  CASE WHEN coalesce(idcg_q6, 0) = 0 THEN NULL
       ELSE CAST((dcg_q6 * $Scale) // idcg_q6 AS BIGINT) END AS ndcg_q6
FROM dcg LEFT JOIN ideal ON dcg.q = ideal.rq
ORDER BY 1"""
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
