package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** 2-D skyline vs the quadratic dominance definition, tie semantics, and
  * the bounded-frame plan shape.
  */
class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 <= y && (x2 < x || y2 < y)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Long, Long)], parts: Int = 4): Set[Long] =
    Skyline.skyline2d(pts.toDF("id", "x", "y").repartition(parts), "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet

  test("matches the quadratic dominance definition on random points") {
    val pts = (1L to 300L).map { i =>
      (i, (i * 7919) % 50, (i * 104729) % 50)
    }
    assert(run(pts) === brute(pts))
  }

  test("exact duplicates on the frontier all survive") {
    val pts = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 6L, 6L), (4L, 1L, 9L))
    val got = run(pts)
    assert(got === Set(1L, 2L, 4L)) // both (5,5) copies; (6,6) dominated
  }

  test("same-x ties: only the min-y rows survive that column") {
    val pts = Seq((1L, 3L, 2L), (2L, 3L, 7L), (3L, 9L, 1L))
    assert(run(pts) === Set(1L, 3L))
  }

  test("strictly decreasing staircase is fully on the frontier") {
    val pts = (1L to 10L).map(i => (i, i, 11L - i))
    assert(run(pts) === pts.map(_._1).toSet)
  }

  test("plan: no quadratic join — corpus work is one aggregate plus a broadcast join") {
    val pts = (1L to 100L).map(i => (i, i % 10, i % 7))
    val plan = Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("NestedLoop"), plan.take(2000))
  }
}
