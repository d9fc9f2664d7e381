package graft.llm

import graft.SparkSpec

/** Deterministic-IVF recall: hand-built two-cluster corpus where the
  * int8 codes are exact (max-abs scaling lands on integers with slack),
  * so assignment, probing, brute top-k, and the hit count are all
  * hand-checkable.
  *
  * Codes (127-scaled): id0 (127,0), id1 (127,64), id2 (127,32),
  * id3 (0,127), id4 (25,127), id5 (64,127) — trailing dims zero.
  * Centroids = ids 0 and 3 → lists {0,1,2} and {3,4,5}. Query id1's
  * brute top-2 by int8 dot is {id2: 18177, id5: 16256}; id5 lives in
  * the unprobed cluster, so nProbe=1 recalls exactly 1 of 2.
  */
class AnnRecallSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(1f, 0.5f, 0f, 0f)),
    (2L, Seq(0.8f, 0.2f, 0f, 0f)),
    (3L, Seq(0f, 1f, 0f, 0f)),
    (4L, Seq(0.2f, 1f, 0f, 0f)),
    (5L, Seq(0.5f, 1f, 0f, 0f))).toDF("vec_id", "embedding")

  test("partial probe misses the cross-cluster neighbor; both probes recall all") {
    val q1 = corpus.where($"vec_id" === 1L)
    val got1 = AnnRecall
      .int8IvfRecall(corpus, q1, Seq(0L, 3L), k = 2, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got1.toSeq == Seq((1L, 1L)))
    val got2 = AnnRecall
      .int8IvfRecall(corpus, q1, Seq(0L, 3L), k = 2, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got2.toSeq == Seq((1L, 2L)))
  }

  test("full probe gives k hits for every query — the brute-force identity") {
    val got = AnnRecall
      .int8IvfRecall(corpus, corpus, Seq(0L, 3L), k = 3, nProbe = 2)
      .orderBy("query_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L to 5L).map(i => (i, 3L)))
  }

  test("guards: missing centroid vector, nProbe beyond the list count") {
    intercept[IllegalArgumentException] {
      AnnRecall.int8IvfRecall(corpus, corpus, Seq(0L, 99L), k = 2, nProbe = 1)
    }
    intercept[IllegalArgumentException] {
      AnnRecall.int8IvfRecall(corpus, corpus, Seq(0L, 3L), k = 2, nProbe = 3)
    }
  }
}
