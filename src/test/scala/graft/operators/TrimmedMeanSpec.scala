package graft.operators

import graft.SparkSpec

/** Trimmed mean: hand trim, outlier immunity, tie-multiset semantics,
  * small-group NULLs, sign-split, strata, partitioning independence.
  */
class TrimmedMeanSpec extends SparkSpec {

  import spark.implicits._

  private def tm(k: Int, vs: Long*) =
    TrimmedMean.trimmedMean(vs.map(("g", _)).toDF("grp", "v"), "grp", "v", k)
      .head()

  test("hand trim: drop one each side") {
    val r = tm(1, 1L, 2L, 3L, 4L, 100L)
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 9L && r.getLong(4) == 3000000L)
  }

  test("one bot cannot move the trimmed mean") {
    val clean = tm(2, 10L, 10L, 10L, 10L, 10L, 10L)
    val bot = tm(2, 10L, 10L, 10L, 10L, 10L, 1000000L)
    assert(clean.getLong(4) == 10000000L && bot.getLong(4) == 10000000L)
  }

  test("ties trim by value multiset: the sum is tie-invariant") {
    // k=1 on 5,5,5: any tied copy trims identically
    val r = tm(1, 5L, 5L, 5L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 5L)
  }

  test("groups with n <= 2k publish NULL") {
    val r = tm(2, 1L, 2L, 3L, 4L)
    assert(r.getLong(1) == 4L && r.isNullAt(2) && r.isNullAt(4))
  }

  test("negative means truncate sign-split toward zero") {
    // trimmed values -7, 0: mean -7/2 -> -3500000
    val r = tm(1, -100L, -7L, 0L, 50L)
    assert(r.getLong(3) == -7L && r.getLong(4) == -3500000L)
  }

  test("partitioning independence at a larger size") {
    val vs = (1 to 200).map(i => ((i * 7919L) % 997L) - 300L)
    val one = TrimmedMean.trimmedMean(
      vs.map(("g", _)).toDF("grp", "v").coalesce(1), "grp", "v", 10).head()
    val many = TrimmedMean.trimmedMean(
      vs.map(("g", _)).toDF("grp", "v").repartition(13), "grp", "v", 10)
      .head()
    assert(one.getLong(3) == many.getLong(3))
    val sorted = vs.sorted.drop(10).dropRight(10)
    assert(one.getLong(3) == sorted.sum)
  }

  test("NULL strata are real; NULL values drop") {
    val df = Seq((Some("g"), Some(1L)), (Some("g"), Some(2L)),
      (Some("g"), Some(3L)), (None, Some(5L)), (Some("g"), None))
      .toDF("grp", "v")
    val got = TrimmedMean.trimmedMean(df, "grp", "v", 1).collect()
    assert(got.length == 2)
    assert(got.find(!_.isNullAt(0)).get.getLong(3) == 2L)
  }
}
