package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interval-join semantics (containment incl. boundaries, keys, bucket-size
  * independence) and the scale contract: the plan must be a hash/sort-merge
  * equi-join, never a BroadcastNestedLoopJoin, and must not duplicate pairs
  * even when an interval spans many cells.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val points = Seq(
    (1L, 1L, ts("2024-01-01 10:00:00")),
    (2L, 1L, ts("2024-01-01 10:59:59")),
    (3L, 1L, ts("2024-01-01 11:00:00")),  // == end: excluded half-open
    (4L, 2L, ts("2024-01-01 10:30:00")),  // right user, inside interval of user 1
    (5L, 1L, ts("2024-01-03 00:00:00"))   // far outside
  ).toDF("pid", "user", "ts")

  private lazy val intervals = Seq(
    (100L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
    (101L, 2L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))  // spans 24 cells
  ).toDF("iid", "iuser", "s", "e")

  private def pairs(halfOpen: Boolean, bucket: String = "1 hour") =
    RangeJoin.intervalJoin(points, intervals, "ts", "s", "e",
        on = Seq("user" -> "iuser"), bucket = bucket, halfOpen = halfOpen)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("half-open containment with equi-key") {
    assert(pairs(halfOpen = true) === Set((1L, 100L), (2L, 100L), (4L, 101L)))
  }

  test("closed intervals include the right boundary") {
    assert(pairs(halfOpen = false) === Set((1L, 100L), (2L, 100L), (3L, 100L), (4L, 101L)))
  }

  test("result is bucket-size independent (no duplicate pairs from multi-cell intervals)") {
    assert(pairs(halfOpen = true, bucket = "10 minutes") === pairs(halfOpen = true, bucket = "1 day"))
    assert(pairs(halfOpen = true, bucket = "7 seconds") === pairs(halfOpen = true))
  }

  test("plan is an equi-join, not a nested loop") {
    val df = RangeJoin.intervalJoin(points, intervals, "ts", "s", "e",
      on = Seq("user" -> "iuser"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("no equi-keys still works (pure containment)") {
    val got = RangeJoin.intervalJoin(points, intervals, "ts", "s", "e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 100L), (2L, 100L), (4L, 101L),
      (1L, 101L), (2L, 101L), (3L, 101L), (4L, 100L)))
  }
}
