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
