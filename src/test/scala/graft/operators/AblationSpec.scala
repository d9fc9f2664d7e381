package graft.operators

import graft.SparkSpec

/** LOO ablation: hand ratio algebra, all-mass NULL, negative-den raise. */
class AblationSpec extends SparkSpec {

  import spark.implicits._

  test("hand LOO table for a mean metric") {
    // means: global 60/6 = 10; drop a (40/3): loo = 20/3 = 6.666666;
    // drop b (20/3): loo = 40/3 = 13.333333
    val df = Seq(("a", 40L, 3L), ("b", 20L, 3L)).toDF("g", "num", "den")
    val got = Ablation.leaveOneOut(df, "g", "num", "den")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("metric_q6"),
        r.getAs[Long]("loo_q6"), r.getAs[Long]("delta_q6")))
    assert(got.toSeq == Seq(
      ("a", 10000000L, 6666666L, -3333334L),
      ("b", 10000000L, 13333333L, 3333333L)))
  }

  test("a group carrying all denominator mass has NULL LOO") {
    val df = Seq(("a", 5L, 10L), ("b", 3L, 0L)).toDF("g", "num", "den")
    val got = Ablation.leaveOneOut(df, "g", "num", "den")
      .orderBy("g").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("loo_q6"))) // drop a -> den 0
    assert(got(1).getAs[Long]("loo_q6") == 500000L)      // drop b -> 5/10
  }

  test("negative numerators sign-split; negative denominators raise") {
    val df = Seq(("a", -30L, 2L), ("b", 10L, 2L)).toDF("g", "num", "den")
    val got = Ablation.leaveOneOut(df, "g", "num", "den")
      .orderBy("g").head()
    // global -20/4 = -5.0
    assert(got.getAs[Long]("metric_q6") == -5000000L)
    val bad = Seq(("a", 1L, -1L)).toDF("g", "num", "den")
    val e = intercept[Exception] {
      Ablation.leaveOneOut(bad, "g", "num", "den").collect()
    }
    assert(e.getMessage.contains("negative denominator"))
  }
}
