package graft.llm

import graft.SparkSpec

import java.sql.Timestamp

/** State-run compaction: run boundaries, per-user independence, NULL
  * type runs, tie order.
  */
class StateRunsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, user: Long, ts: String, t: Option[String]) =
    (id, user, Timestamp.valueOf(ts), t)

  test("consecutive same-type events collapse; boundaries split runs") {
    val rows = Seq(
      ev(1, 7, "2024-01-01 09:00:00", Some("on")),
      ev(2, 7, "2024-01-01 09:05:00", Some("on")),
      ev(3, 7, "2024-01-01 09:10:00", Some("off")),
      ev(4, 7, "2024-01-01 09:15:00", Some("on")),
      ev(5, 8, "2024-01-01 09:02:00", Some("on")))
    val got = StateRuns.collapse(
        rows.toDF("event_id", "user_id", "ts", "event_type"))
      .orderBy("user_id", "run_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5)))
    // user 7: on×2, off×1, on×1 (a re-entered state is a NEW run);
    // user 8's stream is independent
    assert(got.toSeq == Seq(
      (7L, 1L, "on", 2L), (7L, 2L, "off", 1L), (7L, 3L, "on", 1L),
      (8L, 1L, "on", 1L)))
  }

  test("NULL type forms runs like a value; start/end are exact micros") {
    val rows = Seq(
      ev(1, 7, "2024-01-01 09:00:00", None),
      ev(2, 7, "2024-01-01 09:05:00", None),
      ev(3, 7, "2024-01-01 09:10:00", Some("x")))
    val got = StateRuns.collapse(
        rows.toDF("event_id", "user_id", "ts", "event_type"))
      .orderBy("run_seq").collect()
    assert(got.length == 2)
    // a NULL-first stream still numbers from 1 (the first row is always
    // a boundary — NULL <=> lag-of-nothing must not suppress it)
    assert(got(0).getLong(1) == 1L && got(1).getLong(1) == 2L)
    assert(got(0).isNullAt(2) && got(0).getLong(5) == 2L)
    assert(got(0).getLong(3) == Timestamp.valueOf("2024-01-01 09:00:00").getTime * 1000)
    assert(got(0).getLong(4) == Timestamp.valueOf("2024-01-01 09:05:00").getTime * 1000)
  }

  test("state shares: durations extend to the next change, last censored") {
    val rows = Seq(
      ev(1, 7, "2024-01-01 09:00:00", Some("on")),   // on for 10 min
      ev(2, 7, "2024-01-01 09:10:00", Some("off")),  // off for 5 min
      ev(3, 7, "2024-01-01 09:15:00", Some("on")),   // censored: 0
      ev(4, 8, "2024-01-01 09:00:00", Some("x")))    // single event: span 0
    val got = StateRuns.stateShares(
        rows.toDF("event_id", "user_id", "ts", "event_type"))
      .orderBy("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    // user 7: on 10min (600e6 us), off 5min, final on-run 0 — shares of
    // the 15-minute observed span: 2/3 and 1/3
    assert(got.toSeq == Seq(
      (7L, "off", 300000000L, Some(33333333L)),
      (7L, "on", 600000000L, Some(66666666L)),
      (8L, "x", 0L, None)))
  }

  test("timestamp ties order by id — runs are deterministic") {
    val rows = Seq(
      ev(2, 7, "2024-01-01 09:00:00", Some("b")),
      ev(1, 7, "2024-01-01 09:00:00", Some("a")),
      ev(3, 7, "2024-01-01 09:00:00", Some("b")))
    val got = StateRuns.collapse(
        rows.toDF("event_id", "user_id", "ts", "event_type"))
      .orderBy("run_seq").collect().map(r => (r.getString(2), r.getLong(5)))
    // (ts, id) order: a, b, b → runs a×1, b×2
    assert(got.toSeq == Seq(("a", 1L), ("b", 2L)))
  }
}
