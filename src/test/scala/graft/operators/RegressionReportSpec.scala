package graft.operators

import graft.SparkSpec

/** Regression metrics: hand moments, negative R², constant-target NULL,
  * MAPE zero-target exclusion, NULL contracts.
  */
class RegressionReportSpec extends SparkSpec {

  import spark.implicits._

  test("hand metrics: bias/MAE/MSE/R2/MAPE") {
    val df = Seq(("g", 10L, 12L), ("g", 20L, 18L), ("g", 0L, 1L))
      .toDF("grp", "y", "p")
    val r = ModelEval.regressionReport(df, Seq("grp"), "y", "p").head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("bias") == 1L)
    assert(r.getAs[Long]("mae_q6") == 1666666L)   // 5e6 div 3
    assert(r.getAs[Long]("mse") == 3L)            // 9 div 3
    // sstot*n = 3*500 - 900 = 600; num = 600 - 27 = 573
    assert(r.getAs[Long]("r2_q6") == 955000L)
    assert(r.getAs[Long]("n_nz") == 2L)
    // terms 200000 + 100000, over 2
    assert(r.getAs[Long]("mape_q6") == 150000L)
  }

  test("worse-than-mean model reports negative R2") {
    val df = Seq(("g", 0L, 100L), ("g", 10L, -100L)).toDF("grp", "y", "p")
    val r = ModelEval.regressionReport(df, Seq("grp"), "y", "p").head()
    // sstot*n = 2*100 - 100 = 100; num = 100 - 2*22100 = -44100
    assert(r.getAs[Long]("r2_q6") == -441000000L)
  }

  test("constant target nulls R2; all-zero target nulls MAPE") {
    val df = Seq(("g", 5L, 6L), ("g", 5L, 4L),
      ("z", 0L, 1L), ("z", 0L, -1L)).toDF("grp", "y", "p")
    val got = ModelEval.regressionReport(df, Seq("grp"), "y", "p")
      .orderBy("grp").collect()
      .map(r => (r.getString(0),
        Option(r.get(r.fieldIndex("r2_q6"))),
        Option(r.get(r.fieldIndex("mape_q6")))))
    assert(got(0)._2.isEmpty)           // g: constant y
    assert(got(1)._3.isEmpty)           // z: no nonzero targets
  }

  test("NULL y/pred rows drop; NULL group is a real stratum") {
    val df = Seq(
      (Some("a"), Some(10L), Some(10L)), (Some("a"), None, Some(5L)),
      (Some("a"), Some(3L), None), (Option.empty[String], Some(4L), Some(6L)))
      .toDF("grp", "y", "p")
    val got = ModelEval.regressionReport(df, Seq("grp"), "y", "p").collect()
      .map(r => (Option(r.getString(0)), r.getAs[Long]("n"),
        r.getAs[Long]("bias")))
    assert(got.toSet == Set((Some("a"), 1L, 0L), (None, 1L, 2L)))
  }
}
