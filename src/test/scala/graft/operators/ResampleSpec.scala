package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gap-fill contracts: hand-checked grid, fill and observed semantics,
  * whale-key spine bounded by span not event count, partitioning
  * independence, and the partial-agg plan shape.
  */
class ResampleSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def eventsDf = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 00:10:00"), 5.0),
      (1L, ts("2024-01-01 00:50:00"), 3.0),  // same bucket, max -> 5.0
      (1L, ts("2024-01-01 03:15:00"), 7.0),  // 2-bucket gap
      (2L, ts("2024-01-01 01:00:00"), 1.0),
      (3L, ts("2024-01-01 02:59:59"), 9.0)   // single event, single bucket
    ).toDF("k", "t", "v")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    Resample.gapFillFfill(df, "k", "t", "v")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2), r.getBoolean(3)))
      .toSet

  test("hand-checked grid: dedup to max, gaps filled forward, flags honest") {
    assert(run(eventsDf) == Set(
      (1L, "2024-01-01 00:00:00.0", 5.0, true),
      (1L, "2024-01-01 01:00:00.0", 5.0, false),
      (1L, "2024-01-01 02:00:00.0", 5.0, false),
      (1L, "2024-01-01 03:00:00.0", 7.0, true),
      (2L, "2024-01-01 01:00:00.0", 1.0, true),
      (3L, "2024-01-01 02:00:00.0", 9.0, true)))
  }

  test("null keys and timestamps are excluded") {
    import spark.implicits._
    val withNulls = eventsDf.unionByName(Seq(
      (Option.empty[Long], Option(ts("2024-01-01 05:00:00")), Option(1.0)),
      (Option(9L), Option.empty[java.sql.Timestamp], Option(1.0)))
      .toDF("k", "t", "v"))
    assert(run(withNulls) == run(eventsDf))
  }

  test("whale key: spine rows bounded by span, not event count") {
    import spark.implicits._
    val whale = (0 until 10000)
      .map(i => (7L, ts(f"2024-01-01 00:00:${i % 60}%02d.${i % 1000}%03d"), i.toDouble))
      .toDF("k", "t", "v")
    val out = Resample.gapFillFfill(whale, "k", "t", "v").collect()
    assert(out.length == 1 && out.head.getDouble(2) == 9999.0)
  }

  test("result is invariant under input partitioning") {
    assert(run(eventsDf.repartition(11)) == run(eventsDf.coalesce(1)))
  }

  test("plan: observation collapse is a partial aggregate; no cartesian") {
    val plan = Resample.gapFillFfill(eventsDf, "k", "t", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("linear fill: hand-checked interpolation, exact and truncating") {
    import spark.implicits._
    // key 1: observed at buckets 0 (v=5) and 3 (v=7) -> gap cells at
    // 1, 2 interpolate 5 + (2/3)*1e6... per-cell: 5e6 + trunc(2*d*1e6/3)
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 5L),
      (1L, ts("2024-01-01 03:15:00"), 7L),
      (2L, ts("2024-01-01 01:00:00"), -3L),
      (2L, ts("2024-01-01 03:00:00"), -6L)) // negative slope: sign-split
      .toDF("k", "t", "v")
    val got = Resample.gapFillLinear(df, "k", "t", "v")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got == Set(
      (1L, "2024-01-01 00:00:00.0", 5000000L, true),
      (1L, "2024-01-01 01:00:00.0", 5000000L + 666666L, false),
      (1L, "2024-01-01 02:00:00.0", 5000000L + 1333333L, false),
      (1L, "2024-01-01 03:00:00.0", 7000000L, true),
      (2L, "2024-01-01 01:00:00.0", -3000000L, true),
      // -3 + (-3)*(1/2) = -4.5; sign-split trunc of -1500000
      (2L, "2024-01-01 02:00:00.0", -4500000L, false),
      (2L, "2024-01-01 03:00:00.0", -6000000L, true)), got.toString)
  }

  test("linear fill: every unobserved cell has both neighbors (total interpolation)") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 05:00:00"), 11L)).toDF("k", "t", "v")
    val got = Resample.gapFillLinear(df, "k", "t", "v")
      .collect().map(r => r.getLong(2))
    assert(got.length == 6)
    assert(got.forall(_ != 0L), "no cell may be left unfilled")
    // exact arithmetic: slope 2/hour -> 1,3,5,7,9,11 in q6
    assert(got.sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L, 9L, 11L).map(_ * 1000000L))
  }
}
