package graft.operators

import graft.SparkSpec

class HolmSpec extends SparkSpec {
  import spark.implicits._

  test("hand step-down at alpha = 1/20: running-max terms and monotone rejection") {
    val tests = Seq(("g", 1L, 10000L), ("g", 2L, 20000L),
      ("g", 3L, 30000L), ("g", 4L, 800000L)).toDF("g", "id", "p")
    val got = Fdr.holmDecisions(tests, "g", "id", "p", 1, 20)
      .orderBy("rk").collect()
      .map(r => (r.getLong(3), r.getBoolean(4), r.getLong(5))).toSeq
    // terms (m-rk+1)*p: 40000, 60000, 60000, 800000; bar = 1e6/20 = 50000
    assert(got == Seq((1L, true, 40000L), (2L, false, 60000L),
      (3L, false, 60000L), (4L, false, 800000L)))
  }

  test("step-down is never more permissive than BH step-up on the same family") {
    val ps = Seq(500L, 900L, 48000L, 52000L, 120000L, 430000L, 990000L)
    val tests = ps.zipWithIndex.map { case (p, i) => ("g", i.toLong, p) }
      .toDF("g", "id", "p")
    val holm = Fdr.holmDecisions(tests, "g", "id", "p", 1, 20)
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    val bh = Fdr.bhDecisions(tests, "g", "id", "p", 1, 20)
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(holm.forall { case (id, rej) => !rej || bh(id) })
    assert(holm.values.exists(identity)) // something still rejects
  }

  test("adjusted p caps at 1e6; out-of-range p raises; NULL groups are strata") {
    val tests = Seq(("g", 1L, 900000L), ("g", 2L, 950000L)).toDF("g", "id", "p")
    val adj = Fdr.holmDecisions(tests, "g", "id", "p", 1, 20)
      .orderBy("rk").collect().map(_.getLong(5)).toSeq
    assert(adj == Seq(1000000L, 1000000L)) // (2)*9e5 and max-capped
    val bad = Seq(("g", 1L, 2000000L)).toDF("g", "id", "p")
    val ex = intercept[Exception](
      Fdr.holmDecisions(bad, "g", "id", "p", 1, 20).collect())
    assert(ex.getMessage.contains("outside"))
    val strata = Seq((Some("g"), 1L, 1000L), (Option.empty[String], 2L, 1000L))
      .toDF("g", "id", "p")
    assert(Fdr.holmDecisions(strata, "g", "id", "p", 1, 20).count() == 2)
  }
}
