package graft.operators

import graft.SparkSpec

/** Siegel: exact line recovery, the 43%-contamination case Theil–Sen
  * loses and Siegel survives, sign-split truncation, raises, strata.
  */
class SiegelSpec extends SparkSpec {

  import spark.implicits._

  test("a clean line recovers its exact quantized slope") {
    val df = (1L to 6L).map(x => ("g", x, 3 * x + 7)).toDF("grp", "x", "y")
    val r = Siegel.slope(df, "grp", "x", "y").head()
    assert(r.getLong(1) == 6L && r.getLong(2) == 3000000L)
  }

  test("survives 3-of-7 corruption where Theil-Sen breaks") {
    // 4 points on y = 2x, 3 points blasted upward
    val good = Seq(1L, 2L, 3L, 4L).map(x => ("g", x, 2 * x))
    val bad = Seq(5L, 6L, 7L).map(x => ("g", x, 1000 + 100 * x))
    val df = (good ++ bad).toDF("grp", "x", "y")
    val siegel = Siegel.slope(df, "grp", "x", "y").head().getLong(2)
    assert(siegel == 2000000L)
    val theilsen = TheilSen.slope(df, "grp", "x", "y").head().getLong(3)
    assert(theilsen != 2000000L) // only C(4,2)=6 of 21 pairs are clean
  }

  test("negative slopes truncate sign-split toward zero") {
    val df = Seq(("g", 0L, 0L), ("g", 3L, -7L)).toDF("grp", "x", "y")
    assert(Siegel.slope(df, "grp", "x", "y").head().getLong(2) == -2333333L)
  }

  test("duplicate x and whale groups raise in-plan") {
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("grp", "x", "y")
    val e1 = intercept[Exception] {
      Siegel.slope(dup, "grp", "x", "y").collect() }
    assert(e1.getMessage.contains("duplicate x"))
    val big = (1L to 6L).map(x => ("g", x, x)).toDF("grp", "x", "y")
    val e2 = intercept[Exception] {
      Siegel.slope(big, "grp", "x", "y", maxPoints = 5L).collect() }
    assert(e2.getMessage.contains("points"))
  }

  test("single-point groups publish NULL; NULL strata are real") {
    val df = Seq((Some("g"), 1L, 5L), (None, 1L, 1L), (None, 2L, 3L))
      .toDF("grp", "x", "y")
    val got = Siegel.slope(df, "grp", "x", "y").collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r).toMap
    assert(got("g").getLong(1) == 1L && got("g").isNullAt(2))
    assert(got("NULL").getLong(2) == 2000000L)
  }
}
