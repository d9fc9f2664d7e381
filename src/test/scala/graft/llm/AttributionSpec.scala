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

  test("U-shaped credit: 40/20/40 with truncating middle split") {
    val rows = Seq(
      ev(1, 7, "2024-01-01 09:00:00", "view"),
      ev(2, 7, "2024-01-01 09:10:00", "click"),
      ev(3, 7, "2024-01-01 09:20:00", "view"),
      ev(4, 7, "2024-01-01 09:30:00", "click"),
      ev(5, 7, "2024-01-01 09:40:00", "view"),
      ev(6, 7, "2024-01-01 09:50:00", "buy"),    // 5 touches: 4000/666×3/4000
      ev(7, 8, "2024-01-01 09:00:00", "view"),
      ev(8, 8, "2024-01-01 09:30:00", "buy"),    // 1 touch: 10000
      ev(9, 9, "2024-01-01 09:00:00", "view"),
      ev(10, 9, "2024-01-01 09:30:00", "click"),
      ev(11, 9, "2024-01-01 09:45:00", "buy"))   // 2 touches: 5000/5000
    val got = Attribution.uShapedCredit(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        conversionType = "buy", lookback = "1 hour")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == Map(
      (6L, 1L) -> 4000L, (6L, 2L) -> 666L, (6L, 3L) -> 666L,
      (6L, 4L) -> 666L, (6L, 5L) -> 4000L,
      (8L, 7L) -> 10000L,
      (11L, 9L) -> 5000L, (11L, 10L) -> 5000L))
  }

  test("U-shaped: touchless conversions are absent; window bound is closed") {
    val rows = Seq(
      ev(1, 5, "2024-01-01 08:00:00", "view"),   // exactly 60 min before: IN
      ev(2, 5, "2024-01-01 09:00:00", "buy"),
      ev(3, 6, "2024-01-01 07:00:00", "view"),   // 2h before: out
      ev(4, 6, "2024-01-01 09:00:00", "buy"))
    val got = Attribution.uShapedCredit(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        conversionType = "buy", lookback = "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 1L, 10000L)))
  }

  test("time-decay credit: weight halves per halflife step, exact sevenths") {
    val rows = Seq(
      ev(1, 7, "2024-01-01 09:00:00", "view"),   // 60 min before: k=2, w=2^60
      ev(2, 7, "2024-01-01 09:29:59", "click"),  // 30m01s before: k=1, w=2^61
      ev(3, 7, "2024-01-01 09:31:00", "view"),   // 29 min before: k=0, w=2^62
      ev(4, 7, "2024-01-01 10:00:00", "buy"),
      ev(5, 8, "2024-01-01 09:40:00", "view"),
      ev(6, 8, "2024-01-01 10:00:00", "buy"))    // single touch: 10000
    val got = Attribution.timeDecayCredit(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        conversionType = "buy", lookback = "1 hour", halflife = "30 minutes")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("decay_steps"), r.getAs[Long]("credit_bp")))).toMap
    assert(got == Map(
      (4L, 1L) -> ((2L, 1428L)),   // 10000/7
      (4L, 2L) -> ((1L, 2857L)),   // 2·10000/7
      (4L, 3L) -> ((0L, 5714L)),   // 4·10000/7
      (6L, 5L) -> ((0L, 10000L))))
  }

  test("time-decay: steps cap at 62; an ancient touch keeps a sliver, never overflows") {
    val rows = Seq(
      ev(1, 7, "2024-01-01 09:00:00", "view"),   // 3600 steps at 1s -> cap 62
      ev(2, 7, "2024-01-01 10:00:00", "click"),  // 0 steps (same instant)
      ev(3, 7, "2024-01-01 10:00:00", "buy"))
    val got = Attribution.timeDecayCredit(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        conversionType = "buy", lookback = "1 hour", halflife = "1 second")
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getAs[Long]("decay_steps"), r.getAs[Long]("credit_bp")))).toMap
    assert(got(1L) == ((62L, 0L)))
    assert(got(2L) == ((0L, 9999L)))
  }
}
