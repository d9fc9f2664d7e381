package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot diff status classification, null-safe comparison, diff_cols
  * contents, and the churn-sized output contract.
  */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  private def old = Seq(
    (1L, Some("a"), Some(10.0)), // unchanged
    (2L, Some("b"), Some(20.0)), // changed (v)
    (3L, Some("c"), Some(30.0)), // removed
    (4L, None: Option[String], Some(40.0)), // null → value: changed (s)
    (5L, None: Option[String], None: Option[Double])) // null → null: unchanged
    .toDF("k", "s", "v")

  private def nw = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("b"), Some(21.0)),
    (4L, Some("x"), Some(40.0)),
    (5L, None: Option[String], None: Option[Double]),
    (6L, Some("new"), Some(60.0))) // added
    .toDF("k", "s", "v")

  private def run(includeUnchanged: Boolean = false) =
    SnapshotDiff.diff(old, nw, Seq("k"), Seq("s", "v"), includeUnchanged)
      .select(col("k"), col("status"), array_join(col("diff_cols"), ",").as("dc"))
      .as[(Long, String, String)].collect().toSet

  test("added / removed / changed / unchanged classify correctly") {
    assert(run() === Set(
      (2L, "changed", "v"),
      (3L, "removed", ""),
      (4L, "changed", "s"),
      (6L, "added", "")))
  }

  test("includeUnchanged reports every key exactly once") {
    val all = run(includeUnchanged = true)
    assert(all.map(_._1) === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(all.count(_._2 == "unchanged") === 2) // key 1 and the null-pair key 5
  }

  test("multi-column change lists every differing column, sorted by name") {
    val o = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    val n = Seq((1L, "b", 2.0)).toDF("k", "s", "v")
    val got = SnapshotDiff.diff(o, n, Seq("k"), Seq("v", "s"))
      .select(array_join(col("diff_cols"), ",")).as[String].head()
    assert(got === "s,v")
  }

  test("plan: one join, no cartesian") {
    val plan = SnapshotDiff.diff(old, nw, Seq("k"), Seq("s", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
