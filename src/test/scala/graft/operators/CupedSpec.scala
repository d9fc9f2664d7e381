package graft.operators

import graft.SparkSpec

/** CUPED: a hand-computed adjustment that removes a covariate-driven
  * imbalance, the perfectly-correlated covariate case, constant
  * covariate NULLs, one-armed NULLs, the 0/1 raise.
  */
class CupedSpec extends SparkSpec {

  import spark.implicits._

  test("adjustment removes an imbalance the covariate explains") {
    // y = 2x exactly (no treatment effect); treatment got larger x by
    // bad luck. Raw diff is big; theta = 2 exactly; adjusted diff = 0.
    val df = Seq(("g", 1L, 10L, 20L), ("g", 1L, 12L, 24L),
      ("g", 0L, 5L, 10L), ("g", 0L, 7L, 14L)).toDF("grp", "t", "x", "y")
    val r = Cuped.adjustedEffect(df, "grp", "t", "x", "y").head()
    assert(r.getLong(5) == 2000000L)  // theta = 2
    assert(r.getLong(6) == 10000000L) // raw ydiff = 10
    assert(r.getLong(7) == 5000000L)  // xdiff = 5
    assert(r.getLong(8) == 0L)        // adjusted: nothing left
  }

  test("a real effect survives adjustment when arms are x-balanced") {
    // y = 2x + 3t with the covariate BALANCED across arms (the CUPED
    // premise — randomization): theta = 2 exactly, xdiff = 0, adj = 3
    val df = Seq(("g", 1L, 5L, 13L), ("g", 1L, 7L, 17L),
      ("g", 0L, 5L, 10L), ("g", 0L, 7L, 14L)).toDF("grp", "t", "x", "y")
    val r = Cuped.adjustedEffect(df, "grp", "t", "x", "y").head()
    assert(r.getLong(5) == 2000000L && r.getLong(7) == 0L)
    assert(r.getLong(8) == 3000000L)
  }

  test("hand truncation ladder on a non-exact theta") {
    // x in {0,1,2,3}, y = x^2 -> theta = cov/var = 15/5 = 3 exact;
    // use y = x^2 + x%2 to force truncation: moments by hand
    val df = Seq(("g", 0L, 0L, 0L), ("g", 0L, 1L, 2L),
      ("g", 1L, 2L, 4L), ("g", 1L, 3L, 10L)).toDF("grp", "t", "x", "y")
    // n=4 sx=6 sy=16 sxy=0+2+8+30=40 sxx=14
    // cov = 160-96 = 64; var = 56-36 = 20 -> theta = 3.2 exactly
    val r = Cuped.adjustedEffect(df, "grp", "t", "x", "y").head()
    assert(r.getString(3) == "64" && r.getString(4) == "20")
    assert(r.getLong(5) == 3200000L)
    // ydiff = (14*2-2*2)/4 = 6; xdiff = (5*2-1*2)/4 = 2
    assert(r.getLong(6) == 6000000L && r.getLong(7) == 2000000L)
    assert(r.getLong(8) == 6000000L - 6400000L)
  }

  test("constant covariate: NULL theta and adjustment, raw diff reads") {
    val df = Seq(("g", 1L, 5L, 9L), ("g", 0L, 5L, 4L))
      .toDF("grp", "t", "x", "y")
    val r = Cuped.adjustedEffect(df, "grp", "t", "x", "y").head()
    assert(r.isNullAt(5) && r.isNullAt(8))
    assert(r.getLong(6) == 5000000L)
  }

  test("one-armed groups publish NULL diffs; 0/1 raises; NULL strata") {
    val oneArm = Seq(("g", 1L, 1L, 2L), ("g", 1L, 2L, 4L))
      .toDF("grp", "t", "x", "y")
    val r = Cuped.adjustedEffect(oneArm, "grp", "t", "x", "y").head()
    assert(r.isNullAt(6) && r.isNullAt(8))
    val e = intercept[Exception] {
      Cuped.adjustedEffect(Seq(("g", 3L, 1L, 1L)).toDF("grp", "t", "x", "y"),
        "grp", "t", "x", "y").collect()
    }
    assert(e.getMessage.contains("must be 0/1"))
    val mixed = Seq((Some("g"), 1L, 1L, 2L), (Some("g"), 0L, 2L, 1L),
      (None, 1L, 1L, 1L), (None, 0L, 2L, 2L)).toDF("grp", "t", "x", "y")
    assert(Cuped.adjustedEffect(mixed, "grp", "t", "x", "y")
      .collect().length == 2)
  }
}
