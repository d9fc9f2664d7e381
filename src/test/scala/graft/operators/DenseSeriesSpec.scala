package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Calendar densification: zero rows for missing days, per-group spans,
  * exact sums, contracts, and the no-window output-sized plan.
  */
class DenseSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("gap days materialize as zero rows inside each group's own span") {
    val df = Seq(
      ("a", d("2024-01-01"), 10L),
      ("a", d("2024-01-01"), 5L),   // same day aggregates
      ("a", d("2024-01-04"), 7L),   // Jan 2-3 are a and only a's gap
      ("b", d("2024-02-10"), 1L)    // single-day span: no padding
    ).toDF("g", "dt", "v")
    val got = DenseSeries.denseDaily(df, "g", "dt", "v")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("a", "2024-01-01", 2L, 15L),
      ("a", "2024-01-02", 0L, 0L),
      ("a", "2024-01-03", 0L, 0L),
      ("a", "2024-01-04", 1L, 7L),
      ("b", "2024-02-10", 1L, 1L)))
  }

  test("NULL dates drop; a day with rows but NULL values keeps its count") {
    val df = Seq(
      ("a", Some(d("2024-01-01")), Some(3L)),
      ("a", None, Some(99L)),
      ("a", Some(d("2024-01-02")), None)
    ).toDF("g", "dt", "v")
    val got = DenseSeries.denseDaily(df, "g", "dt", "v")
      .collect().map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("2024-01-01", 1L, 3L), ("2024-01-02", 1L, 0L)))
  }

  test("float value column is rejected loudly") {
    val df = Seq(("a", d("2024-01-01"), 1.5)).toDF("g", "dt", "v")
    val e = intercept[IllegalArgumentException] {
      DenseSeries.denseDaily(df, "g", "dt", "v")
    }
    assert(e.getMessage.contains("integral value column"))
  }

  test("NULL-group rows drop instead of zero-filling a fabricated outage") {
    val df = Seq(
      (Some("a"), d("2024-01-01"), 3L),
      (None, d("2024-01-01"), 100L),
      (None, d("2024-01-02"), 200L)
    ).toDF("g", "dt", "v")
    val got = DenseSeries.denseDaily(df, "g", "dt", "v")
      .collect().map(r => (Option(r.getString(0)), r.getLong(2), r.getLong(3)))
    // the NULL group must be absent entirely — never present with (0, 0)
    assert(got.toSeq == Seq((Some("a"), 1L, 3L)))
  }

  test("plan: no window function; spine joins back on (group, day)") {
    val df = (1 to 50).map(i => (s"g${i % 3}", d(f"2024-01-${i % 28 + 1}%02d"), i.toLong))
      .toDF("g", "dt", "v")
    val q = DenseSeries.denseDaily(df, "g", "dt", "v")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
