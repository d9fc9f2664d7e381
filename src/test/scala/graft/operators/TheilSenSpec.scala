package graft.operators

import graft.SparkSpec

/** Theil-Sen: hand pair-slope median, outlier robustness vs OLS,
  * single-point NULL, duplicate-x and size guards.
  */
class TheilSenSpec extends SparkSpec {

  import spark.implicits._

  test("hand median of quantized pair slopes shrugs off the outlier") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 3L), ("g", 3L, 4L),
      ("g", 10L, 50L)).toDF("grp", "x", "y")
    val r = TheilSen.slope(df, "grp", "x", "y").head()
    assert(r.getAs[Long]("n_points") == 4L)
    assert(r.getAs[Long]("n_pairs") == 6L)
    // sorted slopes: 1e6, 1.5e6, 2e6, 5444444, 5875000, 6571428;
    // k = (6+1) div 2 = 3 -> 2e6 (the outlier pulls OLS far above 2)
    assert(r.getAs[Long]("slope_q6") == 2000000L)
  }

  test("a perfect line reports its exact slope; negatives sign-split") {
    val up = Seq(("g", 1L, 3L), ("g", 2L, 6L), ("g", 3L, 9L))
      .toDF("grp", "x", "y")
    assert(TheilSen.slope(up, "grp", "x", "y").head()
      .getAs[Long]("slope_q6") == 3000000L)
    val dn = Seq(("g", 1L, 0L), ("g", 4L, -1L)).toDF("grp", "x", "y")
    // one pair: floor-toward-zero of -1e6/3 = -333333
    assert(TheilSen.slope(dn, "grp", "x", "y").head()
      .getAs[Long]("slope_q6") == -333333L)
  }

  test("single-point groups report NULL slope with zero pairs") {
    val df = Seq(("g", 1L, 5L)).toDF("grp", "x", "y")
    val r = TheilSen.slope(df, "grp", "x", "y").head()
    assert(r.getAs[Long]("n_pairs") == 0L)
    assert(r.isNullAt(r.fieldIndex("slope_q6")))
  }

  test("duplicate x and oversized groups raise loudly") {
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("grp", "x", "y")
    val e = intercept[Exception] {
      TheilSen.slope(dup, "grp", "x", "y").collect()
    }
    assert(e.getMessage.contains("duplicate x"))
    val big = (1 to 10).map(i => ("g", i.toLong, i.toLong))
      .toDF("grp", "x", "y")
    val e2 = intercept[Exception] {
      TheilSen.slope(big, "grp", "x", "y", maxPoints = 5).collect()
    }
    assert(e2.getMessage.contains("pair set"))
  }

  test("a NULL group is a real stratum and keeps its slope (r10 fix)") {
    import spark.implicits._
    val df = Seq((Some("g"), 1L, 2L), (Some("g"), 2L, 4L),
      (None, 1L, 3L), (None, 2L, 6L)).toDF("grp", "x", "y")
    val got = TheilSen.slope(df, "grp", "x", "y").collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r).toMap
    assert(got("NULL").getLong(3) == 3000000L)
    assert(got("g").getLong(3) == 2000000L)
  }
}
