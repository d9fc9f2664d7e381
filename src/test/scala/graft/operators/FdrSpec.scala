package graft.operators

import graft.SparkSpec

/** BH-FDR: hand step-up, the rank-1-rescued-by-rank-2 property,
  * per-term-floored q-values, range guard.
  */
class FdrSpec extends SparkSpec {

  import spark.implicits._

  test("hand step-up at alpha = 1/4: only rank 1 passes") {
    val df = Seq(("g", 1L, 10000L), ("g", 2L, 200000L),
      ("g", 3L, 260000L), ("g", 4L, 900000L)).toDF("grp", "id", "p")
    val got = Fdr.bhDecisions(df, "grp", "id", "p", 1, 4)
      .orderBy("rk").collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Boolean]("reject"),
        r.getAs[Long]("q_q6")))
    assert(got.toSeq == Seq((1L, true, 40000L), (2L, false, 346666L),
      (3L, false, 346666L), (4L, false, 900000L)))
  }

  test("step-up rescues rank 1 through rank 2") {
    // p1 misses its own threshold (70000 > 62500) but p2 passes
    // (80000 <= 125000), so k* = 2 rejects BOTH
    val df = Seq(("g", 1L, 70000L), ("g", 2L, 80000L),
      ("g", 3L, 900000L), ("g", 4L, 950000L)).toDF("grp", "id", "p")
    val got = Fdr.bhDecisions(df, "grp", "id", "p", 1, 4)
      .orderBy("rk").collect().map(_.getAs[Boolean]("reject"))
    assert(got.toSeq == Seq(true, true, false, false))
  }

  test("q-values bound by the last rank's own p; groups independent") {
    // a: terms (2*999998/1, 2*999999/2) = (1999996, 999999); the tail
    // min always reaches rank m's term (= p_max <= 1e6), so rank 1's
    // q collapses to 999999 — the cap is a safety bound, never binding
    val df = Seq(("a", 1L, 999998L), ("a", 2L, 999999L),
      ("b", 1L, 1000L)).toDF("grp", "id", "p")
    val got = Fdr.bhDecisions(df, "grp", "id", "p", 1, 20)
      .collect().map(r => (r.getString(0), r.getAs[Long]("q_q6"),
        r.getAs[Boolean]("reject"))).toSet
    assert(got == Set(("a", 999999L, false), ("b", 1000L, true)))
  }

  test("p outside [0, 1e6] raises loudly — on any projection") {
    val df = Seq(("g", 1L, 2000000L)).toDF("grp", "id", "p")
    val e = intercept[Exception] {
      Fdr.bhDecisions(df, "grp", "id", "p", 1, 20).collect()
    }
    assert(e.getMessage.contains("outside [0, 1000000]"))
    // column pruning must not strip the guard from a q-only projection
    val e2 = intercept[Exception] {
      Fdr.bhDecisions(df, "grp", "id", "p", 1, 20).select("q_q6").collect()
    }
    assert(e2.getMessage.contains("outside [0, 1000000]"))
  }
}
