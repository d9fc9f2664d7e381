package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Completeness monitor: per-day null accounting, basis-point floor,
  * dotted column names, null-timestamp contract, single-aggregate plan.
  */
class CompletenessSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("per-day null counts and basis points, hand-checked") {
    val df = Seq(
      (ts("2024-01-01 01:00:00"), Some("x"), Some(1L)),
      (ts("2024-01-01 02:00:00"), None, Some(2L)),
      (ts("2024-01-01 03:00:00"), Some("y"), None),
      (ts("2024-01-02 01:00:00"), None, None)
    ).toDF("t", "a", "b")
    val got = Completeness.daily(df, "t", Seq("a", "b"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("2024-01-01", "a")) == ((3L, 1L, 3333L))) // floor(1e4/3)
    assert(got(("2024-01-01", "b")) == ((3L, 1L, 3333L)))
    assert(got(("2024-01-02", "a")) == ((1L, 1L, 10000L)))
    assert(got(("2024-01-02", "b")) == ((1L, 1L, 10000L)))
  }

  test("NULL timestamps drop; dotted column names are safe") {
    val df = Seq(
      (Some(ts("2024-01-01 01:00:00")), Some("x")),
      (None, None)
    ).toDF("t", "a.b")
    val got = Completeness.daily(df, "t", Seq("a.b"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a.b", 1L, 0L)))
  }

  test("plan: one aggregate pass, no join, no window") {
    val df = Seq((ts("2024-01-01 01:00:00"), Some("x"), Some(1L)))
      .toDF("t", "a", "b")
    val plan = Completeness.daily(df, "t", Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("WindowExec"), plan)
  }
}
