package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-score standardization: hand-computed moments, degenerate groups, and
  * the broadcast-moments plan shape.
  */
class OutliersSpec extends SparkSpec {

  import spark.implicits._

  test("z-scores match hand-computed group moments") {
    // group g: values 1..5 → mean 3, var (sumsq/n - mean²) = 11 - 9 = 2
    val df = (1 to 5).map(i => ("g", i.toLong, i.toDouble)).toDF("grp", "id", "v")
    val got = Outliers.zscore(df, "grp", "v", threshold = 1.2)
      .select("id", "z_scaled", "is_outlier")
      .as[(Long, Option[Long], Boolean)].collect()
      .map { case (k, z, f) => k -> ((z.get, f)) }.toMap
    val std = math.sqrt(2.0)
    (1 to 5).foreach { i =>
      val z = (i - 3.0) / std
      assert(got(i.toLong) === (math.floor(z * 1e4).toLong, math.abs(z) > 1.2))
    }
  }

  test("constant group: NULL z, nothing flagged") {
    val df = Seq(("c", 1L, 7.0), ("c", 2L, 7.0)).toDF("grp", "id", "v")
    val got = Outliers.zscore(df, "grp", "v")
      .select("z_scaled", "is_outlier").as[(Option[Long], Boolean)].collect()
    assert(got.forall { case (z, f) => z.isEmpty && !f })
  }

  test("single-row group: variance 0, NULL z") {
    val df = Seq(("s", 1L, 42.0)).toDF("grp", "id", "v")
    val got = Outliers.zscore(df, "grp", "v")
      .select("z_scaled").as[Option[Long]].head()
    assert(got.isEmpty)
  }

  test("groups standardize independently") {
    val df = (Seq(("a", 1L, 0.0), ("a", 2L, 10.0)) ++
      Seq(("b", 3L, 1000.0), ("b", 4L, 3000.0))).toDF("grp", "id", "v")
    val z = Outliers.zscore(df, "grp", "v")
      .select("id", "z_scaled").as[(Long, Option[Long])].collect().toMap
    // both groups are symmetric two-point sets: z = ±1 exactly
    assert(z(1L) === Some(-10000L) && z(2L) === Some(10000L))
    assert(z(3L) === Some(-10000L) && z(4L) === Some(10000L))
  }

  test("plan: moments broadcast back — no second shuffle of row data") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toLong, i.toDouble))
      .toDF("grp", "id", "v")
    val plan = Outliers.zscore(df, "grp", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("MAD outliers: hand-checked medians, whale value masks nothing") {
    // g: values 1..9 plus a whale 1000. n=10 → lower median = 5
    // (sorted: 1..9,1000; rank ⌈10/2⌉=5 → 5). devs: 4,3,2,1,0,1,2,3,4,995
    // → sorted devs 0,1,1,2,2,3,3,4,4,995; rank 5 → MAD = 2.
    // flagged at 2 MADs (dev > 4): only the whale (dev 995).
    val df = ((1 to 9).map(i => ("g", i.toLong, i.toLong)) :+ (("g", 10L, 1000L)))
      .toDF("grp", "id", "v")
    val got = Outliers.madOutliers(df, "grp", "v", "id", kNum = 2L, kDen = 1L)
      .select("id", "value", "abs_dev", "mad").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((10L, 1000L, 995L, 2L)))
    // the same data through zscore: the whale inflates std so much that
    // nothing reaches |z| > 3 — the masking MAD exists to resist
    val z = Outliers.zscore(df.withColumn("vd", col("v").cast("double")),
        "grp", "vd", threshold = 3.0)
      .where(col("is_outlier")).count()
    assert(z == 0L, "z-score is masked by its own whale; MAD is not")
  }

  test("MAD: zero-MAD group flags every deviating row; NULLs drop") {
    val df = Seq(("g", 1L, Some(5L)), ("g", 2L, Some(5L)), ("g", 3L, Some(5L)),
      ("g", 4L, Some(7L)), ("g", 5L, None))
      .toDF("grp", "id", "v")
    // median 5, devs 0,0,0,2 → MAD 0; dev 2 > 2·0 flags id 4 only
    val got = Outliers.madOutliers(df, "grp", "v", "id", 2L, 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(4L))
  }

  test("winsorize: hand-checked disc-quantile band, tails clip inward") {
    // 1..20: lo = ⌈20/20⌉ = 1st smallest = 1... use 1/4 and 3/4 instead:
    // lo = ⌈20/4⌉ = 5th = 5, hi = ⌈60/4⌉ = 15th = 15
    val df = (1 to 20).map(i => ("g", i.toLong, i.toLong)).toDF("grp", "id", "v")
    val got = Outliers.winsorize(df, "grp", "v", "id", 1L, 4L, 3L, 4L)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(1L) == ((5L, 15L, 5L)))   // below lo clips up
    assert(got(10L) == ((5L, 15L, 10L))) // inside band untouched
    assert(got(20L) == ((5L, 15L, 15L))) // above hi clips down
  }

  test("winsorize: groups clip independently; NULLs drop; float rejected") {
    val df = Seq(("a", 1L, Some(100L)), ("a", 2L, Some(1L)), ("a", 3L, Some(2L)),
      ("b", 4L, Some(7L)), ("b", 5L, None))
      .toDF("grp", "id", "v")
    val got = Outliers.winsorize(df, "grp", "v", "id", 1L, 2L, 1L, 1L)
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    // a: n=3, lo = 2nd smallest = 2, hi = 3rd = 100; b: single value 7
    assert(got == Map(1L -> 100L, 2L -> 2L, 3L -> 2L, 4L -> 7L))
    intercept[IllegalArgumentException] {
      Outliers.winsorize(df.withColumn("v", col("v").cast("double")),
        "grp", "v", "id")
    }
  }

  test("Tukey fences: hand-checked quartiles, sides, interior untouched") {
    // 1..20 + whales −100 and 500: n=22 → q1 = 6th smallest, q3 = 17th
    // sorted: −100,1..20,500 → q1 = 5, q3 = 16, IQR = 11, fences at
    // 5 − 16.5 = −11.5 and 16 + 16.5 = 32.5
    val df = ((1 to 20).map(i => ("g", i.toLong, i.toLong)) ++
      Seq(("g", 98L, -100L), ("g", 99L, 500L))).toDF("grp", "id", "v")
    val got = Outliers.tukeyFences(df, "grp", "v", "id")
      .collect().map(r => r.getLong(1) -> r.getString(5)).toMap
    assert(got == Map(98L -> "low", 99L -> "high"), s"got $got")
  }

  test("trimmed mean: olympic scoring drops the tails' votes entirely") {
    // 1..8 + whale 1000: n=9; [1/4, 3/4] band: lo = 3rd = 3, hi = 7th = 7
    // kept {3,4,5,6,7} → mean 5
    val df = ((1 to 8).map(i => ("g", i.toLong)) :+ (("g", 1000L)))
      .toDF("grp", "v")
    val got = Outliers.trimmedMean(df, "grp", "v", 1L, 4L, 3L, 4L).head()
    assert((got.getLong(1), got.getLong(2)) == ((5L, 5L)))
    // negative-sum band truncates toward zero via the sign split:
    // wide band keeps everything, mean = −25/3 → −8
    val neg = Seq(("n", -7L), ("n", -8L), ("n", -10L)).toDF("grp", "v")
    assert(Outliers.trimmedMean(neg, "grp", "v", 1L, 100L, 1L, 1L)
      .head().getLong(2) == -8L)
  }

  test("NULL group is a real stratum: MAD screens it, winsorize clips it") {
    val df = Seq(
      (None, 1L, 1L), (None, 2L, 2L), (None, 3L, 3L), (None, 4L, 1000L),
      (Some("g"), 5L, 7L), (Some("g"), 6L, 7L), (Some("g"), 7L, 7L)
    ).toDF("grp", "id", "v")
    // null group: median 2 (n=4 lower), devs 1,0,1,998 → MAD 1; at 2 MADs
    // only the whale (dev 998) flags
    val mad = Outliers.madOutliers(df, "grp", "v", "id", 2L, 1L)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(mad == Set((None, 4L)), s"null-group whale must be screened: $mad")
    // winsorize the null group at [1/4, 3/4]: n=4 → lo = 1st = 1, hi = 3rd = 3
    val win = Outliers.winsorize(df, "grp", "v", "id", 1L, 4L, 3L, 4L)
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(win(4L) == 3L, "null-group whale clips to its own stratum's hi")
    assert(win(5L) == 7L)
  }

  test("MAD: float value column is rejected loudly") {
    val df = Seq(("g", 1L, 1.5)).toDF("grp", "id", "v")
    val e = intercept[IllegalArgumentException] {
      Outliers.madOutliers(df, "grp", "v", "id")
    }
    assert(e.getMessage.contains("integral value column"))
  }
}
