package graft.operators

import graft.SparkSpec

/** RBO: identical-ranking closed form, swap case, disjoint zero,
  * one-sided queries, ranking-contract raises.
  */
class RankBiasedOverlapSpec extends SparkSpec {

  import spark.implicits._

  private def rk(rows: (String, String, Long)*) =
    rows.toSeq.toDF("q", "doc", "r")

  test("identical rankings hit the closed form 1 - p^k exactly") {
    val a = rk(("q1", "x", 1L), ("q1", "y", 2L), ("q1", "z", 3L))
    val r = RankBiasedOverlap.rbo(a, a, "q", "doc", "r", k = 3,
      pNum = 1, pDen = 2).head()
    // sum 1e6/2^d for d=1..3 = 875000
    assert(r.getAs[Long]("rbo_q6") == 875000L)
    assert(r.getAs[Long]("n_common") == 3L)
  }

  test("a top-2 swap loses exactly the depth-1 term") {
    val a = rk(("q1", "x", 1L), ("q1", "y", 2L), ("q1", "z", 3L))
    val b = rk(("q1", "y", 1L), ("q1", "x", 2L), ("q1", "z", 3L))
    val r = RankBiasedOverlap.rbo(a, b, "q", "doc", "r", k = 3,
      pNum = 1, pDen = 2).head()
    // X = (0, 2, 3): terms 0 + 250000 + 125000
    assert(r.getAs[Long]("rbo_q6") == 375000L)
  }

  test("disjoint rankings and one-sided queries score zero, not absent") {
    val a = rk(("q1", "x", 1L), ("q2", "w", 1L))
    val b = rk(("q1", "y", 1L))
    val got = RankBiasedOverlap.rbo(a, b, "q", "doc", "r", k = 3,
        pNum = 1, pDen = 2)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_common"),
        r.getAs[Long]("rbo_q6"))).toSet
    assert(got == Set(("q1", 0L, 0L), ("q2", 0L, 0L)))
  }

  test("duplicate docs/ranks and rank < 1 raise loudly") {
    val good = rk(("q1", "x", 1L))
    for (bad <- Seq(rk(("q1", "x", 1L), ("q1", "x", 2L)),
      rk(("q1", "x", 1L), ("q1", "y", 1L)),
      rk(("q1", "x", 0L)))) {
      val e = intercept[Exception] {
        RankBiasedOverlap.rbo(bad, good, "q", "doc", "r", 3, 1, 2).collect()
      }
      assert(e.getMessage.contains("not a ranking"))
    }
  }
}
