package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — the standard way to blend rankings from
  * systems whose scores aren't comparable (BM25 lexical + ANN embedding
  * retrieval, the [[Bm25]] / [[graft.llm.IvfIndex]] hybrid every RAG
  * stack runs):
  *
  *   RRF(d) = Σ_systems 1 / (k + rank_s(d))
  *
  * with the per-term reciprocal quantized to ⌊10⁹/(k + rank)⌋ so the
  * fused score is an exact integer — summable in any order, engine-
  * replayable, and still strictly rank-monotone within each system
  * (10⁹/(k+r) is injective for r up to ~31k with k=60; deeper candidate
  * lists than that contribute ~0 anyway). k=60 is the literature default
  * (Cormack et al.): it damps the head so one system's #1 can't drown
  * the other's consensus.
  *
  * Scale shape: a union of (query, doc, rank) triples — candidate-list
  * sized, NOT corpus sized (each system already cut to its top-N) — then
  * ONE partial-agg'd groupBy on (query, doc). Nothing here touches
  * documents or embeddings; fusion is a post-retrieval reduce.
  */
object RankFusion {

  val Scale: Long = 1000000000L

  /** Fuse ranked candidate lists, each carrying (`queryCol`, `docCol`,
    * `rankCol` — 1-based within its system). Returns one row per
    * (query, doc) with `n_systems` (how many lists surfaced it),
    * `best_rank`, and the integer `rrf_q`; order by (rrf_q desc, doc)
    * and cut top-N downstream. Rows with NULL query/doc/rank or a
    * non-positive rank are rejected by contract (a malformed candidate
    * list should fail loudly, not skew the fusion).
    */
  def rrf(rankings: Seq[DataFrame], queryCol: String, docCol: String,
          rankCol: String, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 0, "k must be non-negative")
    val std = rankings.zipWithIndex.map { case (r, s) => r.select(
      col(queryCol), col(docCol), col(rankCol).cast("long").as("__rank"),
      lit(s).as("__sys")) }
    val all = std.reduce(_ unionAll _)
      .withColumn("__rank",
        when(col(queryCol).isNull || col(docCol).isNull ||
          col("__rank").isNull || col("__rank") < 1L,
          raise_error(lit("rrf: every candidate needs a non-null query/doc " +
            "and a positive rank")).cast("long"))
          .otherwise(col("__rank")))
    all
      .groupBy(col(queryCol), col(docCol))
      .agg(
        count(lit(1)).as("__cand"),
        countDistinct(col("__sys")).as("n_systems"),
        min(col("__rank")).as("best_rank"),
        sum(expr(s"CAST($Scale div ($k + __rank) AS BIGINT)")).as("rrf_q"))
      // a doc listed TWICE by one system would fabricate consensus —
      // that's a malformed candidate list, and it fails loudly too
      .select(col(queryCol), col(docCol),
        when(col("__cand") =!= col("n_systems"),
          raise_error(lit("rrf: duplicate (query, doc) within one system's " +
            "candidate list")).cast("long"))
          .otherwise(col("n_systems")).as("n_systems"),
        col("best_rank"), col("rrf_q"))
  }

  /** DuckDB replay of [[rrf]] over system subqueries each yielding
    * (query, doc, rank).
    */
  def oracleSql(systemSqls: Seq[String], queryCol: String, docCol: String,
                rankCol: String, k: Int = 60): String = {
    val union = systemSqls.zipWithIndex
      .map { case (s, i) =>
        s"SELECT $queryCol, $docCol, CAST($rankCol AS BIGINT) AS r, $i AS sys FROM ($s)"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH a AS ($union)
       |SELECT $queryCol, $docCol, CAST(count(DISTINCT sys) AS BIGINT) AS n_systems,
       |  CAST(min(r) AS BIGINT) AS best_rank,
       |  CAST(sum($Scale // ($k + r)) AS BIGINT) AS rrf_q
       |FROM a GROUP BY $queryCol, $docCol
       |ORDER BY $queryCol, $docCol""".stripMargin
  }
}
