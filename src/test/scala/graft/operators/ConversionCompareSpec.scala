package graft.operators

import graft.SparkSpec

/** Binary-conversion readout: hand rates, sign-split diffs, NULL and
  * empty-control contracts.
  */
class ConversionCompareSpec extends SparkSpec {

  import spark.implicits._

  test("hand rates and cross-multiplied differences") {
    val df = Seq(
      ("t", true), ("t", true), ("t", false),        // 2/3
      ("c", true), ("c", false), ("c", false), ("c", false)) // 1/4
      .toDF("arm", "conv")
    val r = AbTest.conversionCompare(df, "arm", "conv", "c").head()
    // rate 2/3 -> 666666; ctrl 1/4 -> 250000; diff (2·4 − 1·3)/12 = 5/12
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      (("t", 3L, 2L, 666666L, 250000L, 416666L)))
  }

  test("a worse arm goes negative under the sign-split law") {
    val df = Seq(("t", false), ("t", false), ("t", true),
      ("c", true), ("c", true), ("c", false)).toDF("arm", "conv")
    // t 1/3 vs c 2/3: diff -1/3 -> -333333
    assert(AbTest.conversionCompare(df, "arm", "conv", "c")
      .head().getLong(5) == -333333L)
  }

  test("NULL outcomes drop; an empty control arm raises") {
    val df = Seq(("t", Some(true)), ("t", None), ("c", Some(false)))
      .toDF("arm", "conv")
    assert(AbTest.conversionCompare(df, "arm", "conv", "c")
      .head().getLong(1) == 1L)
    intercept[IllegalArgumentException] {
      AbTest.conversionCompare(df, "arm", "conv", "missing")
    }
  }
}
