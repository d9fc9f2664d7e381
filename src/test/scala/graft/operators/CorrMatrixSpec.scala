package graft.operators

import graft.SparkSpec

/** One-pass correlation matrix: hand moments for all three pairs,
  * complete-case drop, contracts.
  */
class CorrMatrixSpec extends SparkSpec {

  import spark.implicits._

  test("hand 3-column matrix from one pass") {
    val df = Seq(("g", 1L, 2L, 3L), ("g", 2L, 4L, 5L), ("g", 3L, 6L, 8L))
      .toDF("grp", "x", "y", "z")
    val got = CorrMatrix.matrix(df, Seq("grp"), Seq("x", "y", "z"))
      .orderBy("col_a", "col_b").collect()
      .map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b"),
        r.getAs[String]("corr_num"), r.getAs[String]("var_a"),
        r.getAs[String]("var_b")))
    assert(got.toSeq == Seq(
      ("x", "y", "12", "6", "24"),
      ("x", "z", "15", "6", "38"),
      ("y", "z", "30", "24", "38")))
  }

  test("a NULL in ANY declared column drops the whole row") {
    val df = Seq((Some("g"), Some(1L), Some(2L)), (Some("g"), Some(5L), None))
      .toDF("grp", "x", "y")
    val r = CorrMatrix.matrix(df, Seq("grp"), Seq("x", "y")).head()
    assert(r.getAs[Long]("n") == 1L)
  }

  test("duplicate or too-few columns rejected") {
    val df = Seq(("g", 1L)).toDF("grp", "x")
    intercept[IllegalArgumentException] {
      CorrMatrix.matrix(df, Seq("grp"), Seq("x"))
    }
    intercept[IllegalArgumentException] {
      CorrMatrix.matrix(df, Seq("grp"), Seq("x", "x"))
    }
  }
}
