package graft.operators

import graft.SparkSpec

/** Balanced class weights: hand shares/weights, NULL label class. */
class ClassBalanceSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked shares and balanced weights, NULL label included") {
    val df = Seq(Some("x"), Some("x"), Some("x"), Some("y"), None, None)
      .toDF("label")
    val got = ClassBalance.balancedWeights(df, "label")
      .collect()
      .map(r => (if (r.isNullAt(0)) "∅" else r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // N=6, k=3: x 3/6 share w=6e8/(3·3); y 1/6 w=6e8/3; ∅ 2/6 w=6e8/6
    assert(got == Set(
      ("x", 3L, 50000000L, 66666666L),
      ("y", 1L, 16666666L, 200000000L),
      ("∅", 2L, 33333333L, 100000000L)))
  }

  test("a uniform label weighs exactly 1e8") {
    val df = Seq("a", "a", "b", "b").toDF("label")
    assert(ClassBalance.balancedWeights(df, "label")
      .collect().forall(_.getLong(3) == 100000000L))
  }
}
