package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Weighted median: first-crossing rule, unit-weight reduction to the
  * lower median, mass collapse, and the non-positive-weight contract.
  */
class WeightedStatsSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked: heavy cheap units pull the median below the row median") {
    // prices 1 (w 70), 100 (w 20), 1000 (w 10): W=100, crossing at v=1
    val df = Seq(("g", 1L, 70L), ("g", 100L, 20L), ("g", 1000L, 10L))
      .toDF("grp", "v", "w")
    val got = WeightedStats.weightedMedian(df, "grp", "v", "w").head()
    assert((got.getLong(1), got.getLong(2)) == ((100L, 1L)))
  }

  test("unit weights reduce to the lower median (quantile_disc parity)") {
    val even = (1 to 4).map(i => ("g", i.toLong, 1L)).toDF("grp", "v", "w")
    assert(WeightedStats.weightedMedian(even, "grp", "v", "w")
      .head().getLong(2) == 2L)
    val odd = (1 to 5).map(i => ("g", i.toLong, 1L)).toDF("grp", "v", "w")
    assert(WeightedStats.weightedMedian(odd, "grp", "v", "w")
      .head().getLong(2) == 3L)
  }

  test("duplicate values collapse to one mass row; exact boundary crossing") {
    // v=5 total weight 3, v=9 weight 3: W=6, 2·cw(5)=6 >= 6 → median 5
    val df = Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 9L, 3L))
      .toDF("grp", "v", "w")
    assert(WeightedStats.weightedMedian(df, "grp", "v", "w")
      .head().getLong(2) == 5L)
  }

  test("bucketed decomposition is bucketWidth-independent and matches plain") {
    // negative values straddle bucket boundaries under truncating div;
    // duplicate masses, two groups, a NULL group stratum
    val df = Seq(
      (Some("a"), -7L, 3L), (Some("a"), -2L, 1L), (Some("a"), 0L, 2L),
      (Some("a"), 5L, 1L), (Some("a"), 5L, 2L), (Some("a"), 9L, 3L),
      (Some("b"), 100L, 1L), (Some("b"), 101L, 1L), (Some("b"), 102L, 1L),
      (None, 4L, 2L), (None, 6L, 1L))
      .toDF("grp", "v", "w")
    val plain = WeightedStats.weightedMedian(df, "grp", "v", "w")
      .orderBy("grp").collect().toSeq
    for (width <- Seq(1L, 3L, 4L, 1000000L)) {
      val bucketed = WeightedStats
        .weightedMedianBucketed(df, "grp", "v", "w", width)
        .orderBy("grp").collect().toSeq
      assert(bucketed == plain, s"bucketWidth=$width diverged")
    }
    // hand-check one: group a has W=12, masses -7:3, -2:1, 0:2, 5:3, 9:3
    // → cw(-7)=3, cw(-2)=4, cw(0)=6, 2·6 >= 12 → median 0
    assert(plain.find(_.getString(0) == "a").get.getLong(2) == 0L)
  }

  test("weighted P90: first crossing at 9/10 of the mass") {
    // masses 1:50, 2:30, 3:15, 4:5 → W=100; cw(3)=95 ≥ 90 first
    val df = Seq(("g", 1L, 50L), ("g", 2L, 30L), ("g", 3L, 15L), ("g", 4L, 5L))
      .toDF("grp", "v", "w")
    val got = WeightedStats
      .weightedQuantileBucketed(df, "grp", "v", "w", qNum = 9, qDen = 10,
        bucketWidth = 2)
      .head()
    assert((got.getLong(1), got.getLong(2)) == ((100L, 3L)))
    // q = 1 is the maximum
    assert(WeightedStats
      .weightedQuantileBucketed(df, "grp", "v", "w", 1, 1, 2)
      .head().getLong(2) == 4L)
  }

  test("NULL and non-positive weights carry no mass; float rejected") {
    val df = Seq(("g", 1L, Some(0L)), ("g", 2L, Some(-5L)), ("g", 3L, None),
      ("g", 7L, Some(1L))).toDF("grp", "v", "w")
    val got = WeightedStats.weightedMedian(df, "grp", "v", "w").head()
    assert((got.getLong(1), got.getLong(2)) == ((1L, 7L)))
    intercept[IllegalArgumentException] {
      WeightedStats.weightedMedian(df.withColumn("v", col("v").cast("double")),
        "grp", "v", "w")
    }
  }
}
