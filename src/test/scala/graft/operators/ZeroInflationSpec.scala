package graft.operators

import graft.SparkSpec

/** Zero inflation: a hand Poisson-consistent case, a structurally
  * zero-padded one, the all-zero degenerate, negative raise, strata.
  */
class ZeroInflationSpec extends SparkSpec {

  import spark.implicits._

  private def audit(vs: Long*) =
    ZeroInflation.audit(vs.map(("g", _)).toDF("grp", "v"), "grp", "v")
      .head()

  test("a Poisson-consistent series is not flagged") {
    // mean 1: e^-1 ~ 0.3679; n=10 -> expected floor(3.678) = 3 zeros
    val r = audit(0L, 0L, 0L, 1L, 1L, 1L, 1L, 2L, 2L, 2L)
    assert(r.getLong(1) == 10L && r.getLong(2) == 3L && r.getLong(3) == 10L)
    assert(r.getLong(4) == 3L && r.getLong(5) == 0L)
    assert(!r.getBoolean(6))
  }

  test("structural zeros on top of the same rate flag loudly") {
    // same nonzero mass plus six more zeros: mean drops, expected
    // zeros rise, but observed rise faster
    val r = audit(Seq.fill(9)(0L) ++ Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L): _*)
    assert(r.getLong(2) == 9L)
    assert(r.getBoolean(6) && r.getLong(5) > 0L)
  }

  test("an all-zero series is exactly explained (never inflated)") {
    val r = audit(0L, 0L, 0L, 0L)
    assert(r.getLong(4) == 4L && r.getLong(5) == 0L && !r.getBoolean(6))
  }

  test("negative counts raise; NULL strata are real") {
    val e = intercept[Exception] { audit(1L, -1L) }
    assert(e.getMessage.contains("negative count"))
    val df = Seq((Some("g"), Some(0L)), (None, Some(0L)),
      (Some("g"), None)).toDF("grp", "v")
    val got = ZeroInflation.audit(df, "grp", "v").collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }
}
