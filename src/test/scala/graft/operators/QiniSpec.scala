package graft.operators

import graft.SparkSpec

/** Qini: hand cumulative incremental conversions, no-control NULL,
  * flag guard, arm filtering.
  */
class QiniSpec extends SparkSpec {

  import spark.implicits._

  test("hand 2-bucket curve") {
    val df = Seq((1L, 1L, "c", 0L), (2L, 2L, "t", 1L),
      (3L, 3L, "c", 1L), (4L, 4L, "t", 1L))
      .toDF("score", "id", "arm", "conv")
    val got = Qini.curve(df, "score", "id", "arm", "conv", "t", "c", k = 2)
      .orderBy(org.apache.spark.sql.functions.col("bucket").desc)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_treat"),
        r.getAs[Long]("conv_ctrl"), r.getAs[Long]("qini_q6")))
    // top bucket: 1 vs 1, both converted -> 0 incremental;
    // full depth: C_t=2, C_c=1, N_t=N_c=2 -> 1 incremental conversion
    assert(got.toSeq == Seq((2L, 1L, 1L, 0L), (1L, 2L, 1L, 1000000L)))
  }

  test("a depth prefix with no control rows reports NULL") {
    val df = Seq((9L, 1L, "t", 1L), (8L, 2L, "t", 0L),
      (1L, 3L, "c", 0L), (2L, 4L, "c", 1L))
      .toDF("score", "id", "arm", "conv")
    val top = Qini.curve(df, "score", "id", "arm", "conv", "t", "c", k = 2)
      .where($"bucket" === 2L).head()
    assert(top.getAs[Long]("n_ctrl") == 0L)
    assert(top.isNullAt(top.fieldIndex("qini_q6")))
  }

  test("non-0/1 flags raise; third arms drop") {
    val bad = Seq((1L, 1L, "t", 2L)).toDF("score", "id", "arm", "conv")
    intercept[Exception] {
      Qini.curve(bad, "score", "id", "arm", "conv", "t", "c").collect()
    }
    val three = Seq((1L, 1L, "t", 1L), (2L, 2L, "c", 0L),
      (3L, 3L, "x", 1L)).toDF("score", "id", "arm", "conv")
    val total = Qini.curve(three, "score", "id", "arm", "conv", "t", "c",
        k = 2)
      .agg(org.apache.spark.sql.functions.max($"n_treat" + $"n_ctrl"))
      .head().getLong(0)
    assert(total == 2L)
  }
}
