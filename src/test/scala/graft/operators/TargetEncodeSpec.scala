package graft.operators

import graft.SparkSpec

/** Target encoding: smoothed shrinkage algebra, LOO leakage exclusion,
  * singleton NULL contract, NULL-category stratum.
  */
class TargetEncodeSpec extends SparkSpec {

  import spark.implicits._

  // cat a: targets 10, 20 (mean 15); cat b: 40 (singleton); global mean 70/3
  private lazy val df = Seq(
    (1L, Some("a"), 10L), (2L, Some("a"), 20L), (3L, Some("b"), 40L))
    .toDF("id", "cat", "y")

  test("smoothed mean shrinks rare categories toward the global mean") {
    val got = TargetEncode.smoothedMean(df, "cat", "y", m = 1)
      .orderBy("category").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a: (30 + 70/3)/3 = 160/9 = 17.777… -> 17777777 (floor)
    // b: (40 + 70/3)/2 = 190/6 = 31.666… -> 31666666
    assert(got.toSeq == Seq(("a", 2L, 17777777L), ("b", 1L, 31666666L)))
  }

  test("LOO excludes the row's own target; singletons are NULL") {
    val got = TargetEncode.looMean(df, "id", "cat", "y")
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // row 1 sees only 20; row 2 only 10; row 3 has no peers
    assert(got.toSeq == Seq((1L, Some(20000000L)), (2L, Some(10000000L)),
      (3L, None)))
  }

  test("negative targets ride the sign-split law; NULL category encodes") {
    val d2 = Seq((1L, None, -7L), (2L, None, -8L), (3L, Some("z"), 4L))
      .toDF("id", "cat", "y")
    val loo = TargetEncode.looMean(d2, "id", "cat", "y")
      .orderBy("id").collect()
    assert(loo(0).getLong(2) == -8000000L && loo(1).getLong(2) == -7000000L)
    assert(loo(2).isNullAt(2))
    val sm = TargetEncode.smoothedMean(d2, "cat", "y", m = 3)
      .where($"category".isNull).head()
    // NULL cat: (−15 + 3·(−11/3)) / (2+3) = −26/5 = −5.2 → sign-split −5200000
    assert(sm.getLong(2) == -5200000L)
  }
}
