package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Table-profile contracts: null accounting, exact-regime distinct
  * counts, NULL-as-a-value sentinel, single-pass plan.
  */
class TableProfileSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), "x"), (2L, Some("b"), "x"),
    (3L, None, "y"), (4L, Some("a"), "y"), (5L, Some("a"), "y")
  ).toDF("id", "s", "g")

  test("row/null counts and exact-regime distinct per column") {
    val got = Profiling.tableProfile(df, Seq("id", "s", "g"), k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    assert(got("id") == ((5L, 5L, 0L, 5.0, 5L)))
    // s: values {a, b} + NULL sentinel -> 3 distinct; one null row
    assert(got("s") == ((5L, 4L, 1L, 3.0, 3L)))
    assert(got("g") == ((5L, 5L, 0L, 2.0, 2L)))
  }

  test("float columns are rejected loudly (engine-dependent rendering)") {
    val fdf = Seq((1L, 0.1d), (2L, 0.2d)).toDF("id", "ratio")
    val e = intercept[IllegalArgumentException] {
      Profiling.tableProfile(fdf, Seq("id", "ratio"))
    }
    assert(e.getMessage.contains("float column ratio"))
    val f2 = fdf.select(col("id"), col("ratio").cast("float").as("r32"))
    intercept[IllegalArgumentException] {
      Profiling.tableProfile(f2, Seq("r32"))
    }
  }

  test("dotted column names profile correctly (positional agg aliases)") {
    val dotted = df.select(col("id").as("a.b"), col("g").as("c.d"))
    val got = Profiling.tableProfile(dotted, Seq("a.b", "c.d"), k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    assert(got("a.b") == ((5L, 5L, 0L, 5.0, 5L)))
    assert(got("c.d") == ((5L, 5L, 0L, 2.0, 2L)))
  }

  test("plan: exactly one aggregate pass over the input (one scan)") {
    val plan = Profiling.tableProfile(df, Seq("id", "s", "g"), k = 8)
      .queryExecution.executedPlan.toString
    // a single grand aggregate: one pair of partial/final aggregates, no join
    assert(!plan.contains("Join"), plan)
  }
}
