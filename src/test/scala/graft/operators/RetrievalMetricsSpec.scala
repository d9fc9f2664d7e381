package graft.operators

import graft.SparkSpec

/** Retrieval metrics: hand precision/recall/RR, the no-relevance NULL
  * vs no-hit zero distinction, and deterministic tiebreak at the cut.
  */
class RetrievalMetricsSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: hit at rank 2 of k=2 -> P 0.5, R 0.5, RR 0.5") {
    val results = Seq((1L, 10L, 100L), (1L, 20L, 90L), (1L, 30L, 80L))
      .toDF("q", "d", "s")
    val rel = Seq((1L, 20L), (1L, 99L)).toDF("q", "d")
    val r = RetrievalMetrics.atK(results, "q", "d", "s", rel, "q", "d", k = 2)
      .collect().head
    assert(r.getAs[Long]("n_ret") == 2L && r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Long]("hits") == 1L)
    assert(r.getAs[Long]("precision_q6") == 500000L)
    assert(r.getAs[Long]("recall_q6") == 500000L)
    assert(r.getAs[Long]("rr_q6") == 500000L)
  }

  test("no relevant docs: recall NULL; no hit: rr 0 (different things)") {
    val results = Seq((1L, 10L, 100L), (2L, 10L, 100L)).toDF("q", "d", "s")
    val rel = Seq((2L, 77L)).toDF("q", "d")
    val got = RetrievalMetrics.atK(results, "q", "d", "s", rel, "q", "d",
        k = 1).collect().map(r => r.getAs[Long]("q") -> r).toMap
    // q=1: never judged -> recall undefined, rr 0
    assert(got(1L).isNullAt(got(1L).fieldIndex("recall_q6")))
    assert(got(1L).getAs[Long]("rr_q6") == 0L)
    // q=2: judged but missed -> recall 0, rr 0
    assert(got(2L).getAs[Long]("recall_q6") == 0L)
    assert(got(2L).getAs[Long]("rr_q6") == 0L)
  }

  test("score ties cut deterministically by doc id ascending") {
    val results = Seq((1L, 5L, 50L), (1L, 6L, 50L)).toDF("q", "d", "s")
    val rel = Seq((1L, 6L)).toDF("q", "d")
    val r = RetrievalMetrics.atK(results, "q", "d", "s", rel, "q", "d", k = 1)
      .collect().head
    // rank 1 is doc 5 (lower id wins the tie), so the judged doc misses
    assert(r.getAs[Long]("hits") == 0L && r.getAs[Long]("rr_q6") == 0L)
  }

  test("NDCG: per-term quantized hand case with an inverted ranking") {
    // judged: d1 rel 3, d2 rel 1; run returns d2 first (inverted), then
    // d1, then an unjudged d9 -> dcg 2892789, idcg 3630929, ndcg 796707
    val results = Seq((1L, 2L, 100L), (1L, 1L, 90L), (1L, 9L, 80L))
      .toDF("q", "d", "s")
    val judged = Seq((1L, 1L, 3L), (1L, 2L, 1L)).toDF("q", "d", "rel")
    val r = RetrievalMetrics.ndcgAtK(results, "q", "d", "s",
      judged, "q", "d", "rel", k = 3).collect().head
    assert(r.getAs[Long]("dcg_q6") == 2892789L)
    assert(r.getAs[Long]("idcg_q6") == 3630929L)
    assert(r.getAs[Long]("ndcg_q6") == 796707L)
  }

  test("NDCG: perfect order is exactly 1e6; no positive judgment is NULL") {
    val results = Seq((1L, 1L, 100L), (1L, 2L, 90L), (2L, 5L, 50L))
      .toDF("q", "d", "s")
    val judged = Seq((1L, 1L, 3L), (1L, 2L, 1L), (2L, 6L, 0L))
      .toDF("q", "d", "rel")
    val got = RetrievalMetrics.ndcgAtK(results, "q", "d", "s",
        judged, "q", "d", "rel", k = 3)
      .collect().map(r => r.getAs[Long]("q") -> r).toMap
    assert(got(1L).getAs[Long]("ndcg_q6") == 1000000L)
    // q=2's only judgment grades 0: idcg 0 -> NULL
    assert(got(2L).isNullAt(got(2L).fieldIndex("ndcg_q6")))
  }

  test("NDCG: duplicate judgments take max grade; negative grade raises") {
    val results = Seq((1L, 1L, 100L)).toDF("q", "d", "s")
    val dup = Seq((1L, 1L, 1L), (1L, 1L, 3L)).toDF("q", "d", "rel")
    val r = RetrievalMetrics.ndcgAtK(results, "q", "d", "s",
      dup, "q", "d", "rel", k = 1).collect().head
    assert(r.getAs[Long]("dcg_q6") == 3000000L)
    val bad = Seq((1L, 1L, -2L)).toDF("q", "d", "rel")
    val ex = intercept[Exception] {
      RetrievalMetrics.ndcgAtK(results, "q", "d", "s",
        bad, "q", "d", "rel", k = 1).collect()
    }
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: all(t.getCause)
    assert(all(ex).exists(m => m != null && m.contains("negative relevance")))
  }

  test("fewer results than k penalizes precision (declared-k denominator)") {
    val results = Seq((1L, 10L, 100L)).toDF("q", "d", "s")
    val rel = Seq((1L, 10L)).toDF("q", "d")
    val r = RetrievalMetrics.atK(results, "q", "d", "s", rel, "q", "d", k = 4)
      .collect().head
    assert(r.getAs[Long]("n_ret") == 1L && r.getAs[Long]("hits") == 1L)
    assert(r.getAs[Long]("precision_q6") == 250000L)
    assert(r.getAs[Long]("rr_q6") == 1000000L)
  }
}
