package graft.operators

import graft.SparkSpec

/** Higher moments: hand numerators on {1,2,3}, skew signs, light vs
  * heavy tails, the overflow-honesty NULL, strata.
  */
class HigherMomentsSpec extends SparkSpec {

  import spark.implicits._

  private def shape(vs: Long*) =
    HigherMoments.shape(vs.map(("g", _)).toDF("grp", "x"), "grp", "x")
      .head()

  test("hand numerators on the uniform {1,2,3}") {
    val r = shape(1L, 2L, 3L)
    assert(r.getString(2) == "6")   // m2: 3*14 - 36
    assert(r.getString(3) == "0")   // symmetric
    assert(r.getString(4) == "54")  // m4
    assert(r.getLong(5) == 0L)
    assert(!r.getBoolean(6))        // uniform is light-tailed: 54 < 108
  }

  test("a long right tail skews positive; a left tail negative") {
    assert(shape(1L, 1L, 1L, 100L).getLong(5) == 1L)
    assert(shape(100L, 100L, 100L, 1L).getLong(5) == -1L)
  }

  test("a rare extreme outlier is heavy-tailed") {
    val r = shape(Seq.fill(20)(0L) :+ 1000L: _*)
    assert(r.getBoolean(6))
  }

  test("constant series: all numerators zero, verdicts degenerate") {
    val r = shape(7L, 7L, 7L)
    assert(r.getString(2) == "0" && r.getString(4) == "0")
    assert(r.getLong(5) == 0L && !r.getBoolean(6)) // 0 > 0 is false
  }

  test("past DECIMAL(38,0) the moments raise loudly, never rescale") {
    val e = intercept[Exception] {
      shape(1000000000L, 2000000000L, 3000000000L)
    }
    assert(e.getMessage.contains("Decimal(38, 0)") ||
      e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE"))
  }

  test("NULL strata are real; NULL values drop") {
    val df = Seq((Some("g"), Some(1L)), (Some("g"), Some(2L)),
      (None, Some(5L)), (Some("g"), None)).toDF("grp", "x")
    val got = HigherMoments.shape(df, "grp", "x").collect()
    assert(got.length == 2)
    assert(got.find(!_.isNullAt(0)).get.getLong(1) == 2L)
  }
}
