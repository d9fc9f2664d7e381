package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Touch attribution: window membership, first/last selection, conversion
  * exclusion, tie order, and the no-self-join plan shape.
  */
class AttributionSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, user: Long, ts: String, t: String) =
    (id, user, Timestamp.valueOf(ts), t)

  private def run(rows: Seq[(Long, Long, Timestamp, String)]) =
    Attribution.firstLastTouch(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        conversionType = "buy", lookback = "1 hour")
      .select("conversion_id", "first_touch_id", "last_touch_id")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (c, f, l) => c -> ((f, l)) }.toMap

  test("first and last touch inside the lookback window, conversions excluded") {
    val got = run(Seq(
      ev(1, 7, "2024-01-01 08:45:00", "view"),   // outside (65 min before conv 4)
      ev(2, 7, "2024-01-01 09:10:00", "view"),   // first in window
      ev(3, 7, "2024-01-01 09:30:00", "click"),
      ev(4, 7, "2024-01-01 09:50:00", "buy"),    // earlier conversion ≠ touch
      ev(5, 7, "2024-01-01 09:55:00", "click"),  // last in window
      ev(6, 7, "2024-01-01 10:05:00", "buy")))
    assert(got === Map(4L -> (Some(2L), Some(3L)), 6L -> (Some(2L), Some(5L))))
  }

  test("boundary: a touch exactly lookback ago is included (closed interval)") {
    val got = run(Seq(
      ev(1, 1, "2024-01-01 09:00:00", "view"),
      ev(2, 1, "2024-01-01 10:00:00", "buy")))
    assert(got === Map(2L -> (Some(1L), Some(1L))))
  }

  test("no touch in window: NULL attribution, conversion row kept") {
    val got = run(Seq(
      ev(1, 1, "2024-01-01 05:00:00", "view"),
      ev(2, 1, "2024-01-01 10:00:00", "buy")))
    assert(got === Map(2L -> (None, None)))
  }

  test("timestamp ties break on event id") {
    val got = run(Seq(
      ev(9, 1, "2024-01-01 09:30:00", "view"),
      ev(3, 1, "2024-01-01 09:30:00", "click"),
      ev(10, 1, "2024-01-01 10:00:00", "buy")))
    assert(got === Map(10L -> (Some(3L), Some(9L))))
  }

  test("users do not leak into each other") {
    val got = run(Seq(
      ev(1, 1, "2024-01-01 09:30:00", "view"),
      ev(2, 2, "2024-01-01 10:00:00", "buy")))
    assert(got === Map(2L -> (None, None)))
  }

  test("plan: one user exchange + window, no events-to-events join") {
    val df = Seq(ev(1, 1, "2024-01-01 09:30:00", "view"),
      ev(2, 1, "2024-01-01 10:00:00", "buy"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val plan = Attribution.firstLastTouch(df, "buy")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(plan.contains("Window"))
  }

  test("calendar-dependent lookbacks are rejected") {
    val df = Seq(ev(1, 1, "2024-01-01 09:30:00", "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Attribution.firstLastTouch(df, "buy", lookback = "1 month")
    }
  }
}
