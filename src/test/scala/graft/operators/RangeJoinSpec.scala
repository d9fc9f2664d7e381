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

  // ---------------------------------------------------- overlap join --

  private lazy val winsA = Seq(
    (1L, ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")),
    (2L, ts("2024-01-10 00:00:00"), ts("2024-01-11 00:00:00")),
    (3L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))
  ).toDF("ak", "as_", "ae")

  private lazy val winsB = Seq(
    (10L, ts("2024-01-04 12:00:00"), ts("2024-01-06 00:00:00")), // overlaps A1
    (11L, ts("2024-01-05 00:00:00"), ts("2024-01-07 00:00:00")), // abuts A1 (half-open: no)
    (12L, ts("2024-01-01 00:00:00"), ts("2024-01-20 00:00:00")), // spans A1+A2
    (13L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))  // disjoint
  ).toDF("bk", "bs", "be")

  private def overlapPairs(halfOpen: Boolean, bucket: String = "1 day") =
    RangeJoin.overlapJoin(winsA, winsB, "as_", "ae", "bs", "be",
        bucket = bucket, halfOpen = halfOpen)
      .select("ak", "bk").as[(Long, Long)].collect().toList

  test("overlap join: intersecting windows pair exactly once, abutting excluded half-open") {
    val got = overlapPairs(halfOpen = true)
    assert(got.size === got.toSet.size, s"duplicate pairs: $got")
    assert(got.toSet === Set((1L, 10L), (1L, 12L), (2L, 12L)))
  }

  test("overlap join: closed semantics admit the abutting window") {
    assert(overlapPairs(halfOpen = false).toSet ===
      Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L)))
  }

  test("overlap join: bucket-size independent, exactly-once under any grid") {
    for (b <- Seq("1 hour", "7 days", "1 minute")) {
      val got = overlapPairs(halfOpen = true, bucket = b)
      assert(got.size === got.toSet.size, s"dups at bucket $b")
      assert(got.toSet === Set((1L, 10L), (1L, 12L), (2L, 12L)), s"bucket $b")
    }
  }

  test("overlap join plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.overlapJoin(winsA, winsB, "as_", "ae", "bs", "be")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join fell back to a nested loop:\n$plan")
  }
}
