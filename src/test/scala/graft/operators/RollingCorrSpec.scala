package graft.operators

import graft.SparkSpec

/** Rolling correlation: hand trailing moments, warm-up NULLs, RANGE
  * gap behavior.
  */
class RollingCorrSpec extends SparkSpec {

  import spark.implicits._

  test("hand 3-wide window moments with warm-up NULLs") {
    val df = Seq(("g", 1L, 1L, 2L), ("g", 2L, 2L, 4L), ("g", 3L, 3L, 7L),
      ("g", 4L, 4L, 8L)).toDF("grp", "i", "x", "y")
    val got = CrossCorr.rolling(df, "grp", "i", "x", "y", window = 3)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("idx"), r.getAs[Long]("n_w"),
        Option(r.getAs[String]("corr_num"))))
    assert(got(0) == (1L, 1L, None))
    assert(got(1) == (2L, 2L, None))
    // idx 3 window {1,2,3}: n*sxy - sx*sy = 3*31 - 6*13 = 15
    assert(got(2) == (3L, 3L, Some("15")))
    // idx 4 window {2,3,4}: 3*(8+21+32) - 9*19 = 183 - 171 = 12
    assert(got(3) == (4L, 3L, Some("12")))
  }

  test("RANGE frame: a gap shrinks n instead of stretching the window") {
    val df = Seq(("g", 1L, 1L, 1L), ("g", 10L, 2L, 2L), ("g", 11L, 3L, 3L))
      .toDF("grp", "i", "x", "y")
    val got = CrossCorr.rolling(df, "grp", "i", "x", "y", window = 3,
        minN = 2)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("idx"), r.getAs[Long]("n_w")))
    // idx 10's trailing-3 range [8,10] holds only itself
    assert(got.toSeq == Seq((1L, 1L), (10L, 1L), (11L, 2L)))
  }

  test("perfect linear coupling: corr_num^2 = var_x * var_y") {
    val df = Seq(("g", 1L, 1L, 3L), ("g", 2L, 2L, 6L), ("g", 3L, 3L, 9L))
      .toDF("grp", "i", "x", "y")
    val r = CrossCorr.rolling(df, "grp", "i", "x", "y", window = 3)
      .orderBy("idx").collect().last
    val cn = BigInt(r.getAs[String]("corr_num"))
    val vx = BigInt(r.getAs[String]("var_x"))
    val vy = BigInt(r.getAs[String]("var_y"))
    assert(cn * cn == vx * vy && cn > 0)
  }
}
