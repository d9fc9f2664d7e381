package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sorted-neighborhood contracts: exact w-window pairs over the total
  * order, boundary-straddling adjacency equi-blocking misses, O(n·w)
  * volume, partitioning independence, no-cartesian plan.
  */
class SortedNeighborhoodSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], w: Int) =
    SortedNeighborhood.candidates(rows.toDF("id", "k"), "id", "k", w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact window-w pairs over the sorted order") {
    val rows = Seq((10L, "a"), (20L, "b"), (30L, "c"), (40L, "d"), (50L, "e"))
    assert(run(rows, 1) == Set((10L, 20L), (20L, 30L), (30L, 40L), (40L, 50L)))
    assert(run(rows, 2) == Set(
      (10L, 20L), (10L, 30L), (20L, 30L), (20L, 40L),
      (30L, 40L), (30L, 50L), (40L, 50L)))
  }

  test("adjacent near-misses pair even when hash blocking would split them") {
    // "jon"/"john" sort adjacent; an equi-block on the exact name never
    // pairs them — the sorted neighborhood does
    val rows = Seq((1L, "john smith"), (2L, "jon smith"), (3L, "zz top"))
    assert(run(rows, 1).contains((1L, 2L)))
  }

  test("candidate volume is exactly n*w - w*(w+1)/2 on distinct keys") {
    val n = 200; val w = 4
    val rows = (1L to n.toLong).map(i => (i, f"k$i%04d"))
    assert(run(rows, w).size == n * w - w * (w + 1) / 2)
  }

  test("partitioning independence and tie determinism") {
    val rows = (1L to 100L).map(i => (i, s"k${i % 10}")) // heavy ties
    def m(p: Int) = SortedNeighborhood.candidates(
        rows.toDF("id", "k").repartition(p), "id", "k", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m(1) == m(7))
  }

  test("plan: block-keyed equi-join, no cartesian") {
    val plan = SortedNeighborhood.candidates(
        Seq((1L, "a"), (2L, "b")).toDF("id", "k"), "id", "k", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
