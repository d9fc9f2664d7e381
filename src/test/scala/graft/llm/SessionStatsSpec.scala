package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Session-stat contracts: bounce counting, engaged time excludes the
  * gap padding, quantized ratio, multi-user independence.
  */
class SessionStatsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, Double)*) =
    rows.toDF("user_id", "us", "value")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"), col("value"))

  test("hand-checked: sessions, bounces, engaged time, quantized bounce rate") {
    val gapUs = 1000000L // 1 second gap for the test
    val got = EventWindows.sessionStats(ev(
        // user 1: session A = events at 0 and 400000us (engaged 400000),
        // session B = single event at 5_000_000 (bounce, engaged 0)
        (1L, 0L, 1.0), (1L, 400000L, 1.0), (1L, 5000000L, 1.0),
        // user 2: one two-event session
        (2L, 0L, 1.0), (2L, 100000L, 1.0)),
        gap = "1 second")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(1L) == ((2L, 1L, 3L, 400000L, 500000L)))
    assert(got(2L) == ((1L, 0L, 2L, 100000L, 0L)))
  }

  test("all-bounce user reaches bounce_scaled == SCALE") {
    val got = EventWindows.sessionStats(ev(
        (1L, 0L, 1.0), (1L, 10000000L, 1.0), (1L, 20000000L, 1.0)),
        gap = "1 second")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
    assert(got(1L) == ((3L, 1000000L)))
  }
}
