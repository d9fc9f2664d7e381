package graft.operators

import graft.SparkSpec

/** Brier decomposition: perfectly-calibrated, perfect-forecaster, and
  * base-rate-only anchors, the identity within floor slack, range and
  * label raises, NULL strata.
  */
class BrierDecompSpec extends SparkSpec {

  import spark.implicits._

  private def rows(spec: (Long, Long, Int)*) =
    spec.flatMap { case (p, y, n) => Seq.fill(n)(("g", p, y.toLong)) }
      .toDF("grp", "p", "y")

  test("calibrated but skill-free: REL 0, RES 0, Brier = UNC") {
    val r = BrierDecomp.decompose(rows((500L, 1L, 2), (500L, 0L, 2)),
      "grp", "p", "y").head()
    assert(r.getLong(3) == 250000L) // brier
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    assert(r.getLong(6) == 250000L)
  }

  test("perfect forecaster: Brier 0, RES = UNC") {
    val r = BrierDecomp.decompose(rows((1000L, 1L, 3), (0L, 0L, 3)),
      "grp", "p", "y").head()
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getLong(5) == 250000L && r.getLong(6) == 250000L)
  }

  test("base-rate miss shows as pure reliability") {
    // constant 0.5 forecast against a 0.75 base rate
    val r = BrierDecomp.decompose(rows((500L, 1L, 3), (500L, 0L, 1)),
      "grp", "p", "y").head()
    assert(r.getLong(3) == 250000L)
    assert(r.getLong(4) == 62500L)  // (0.5-0.75)^2
    assert(r.getLong(5) == 0L)
    assert(r.getLong(6) == 187500L) // 0.75*0.25
  }

  test("the Murphy identity holds within summed floor slack") {
    val df = rows((100L, 0L, 7), (100L, 1L, 2), (300L, 0L, 3),
      (300L, 1L, 4), (900L, 1L, 5), (900L, 0L, 1))
    val r = BrierDecomp.decompose(df, "grp", "p", "y").head()
    val lhs = r.getLong(3)
    val rhs = r.getLong(4) - r.getLong(5) + r.getLong(6)
    assert(math.abs(lhs - rhs) <= 2L * r.getLong(2),
      s"identity slack too big: $lhs vs $rhs")
  }

  test("out-of-range probabilities and non-0/1 labels raise") {
    val e1 = intercept[Exception] {
      BrierDecomp.decompose(rows((1001L, 1L, 1)), "grp", "p", "y").collect()
    }
    assert(e1.getMessage.contains("[0, 1000]"))
    val e2 = intercept[Exception] {
      BrierDecomp.decompose(rows((500L, 2L, 1)), "grp", "p", "y").collect()
    }
    assert(e2.getMessage.contains("must be 0/1"))
  }

  test("NULL groups are real strata; NULL rows drop") {
    val df = Seq((Some("g"), Some(500L), Some(1L)),
      (None, Some(200L), Some(0L)), (Some("g"), None, Some(1L)),
      (Some("g"), Some(300L), None)).toDF("grp", "p", "y")
    val got = BrierDecomp.decompose(df, "grp", "p", "y").collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }
}
