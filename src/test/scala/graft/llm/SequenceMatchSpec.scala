package graft.llm

import java.sql.Timestamp
import graft.SparkSpec

/** Sequence matching with negation: clean path, negation abort,
  * gap violation + re-anchor, first-match freeze, guards.
  */
class SequenceMatchSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, user: Long, ts: String, t: String) =
    (id, user, Timestamp.valueOf(ts), t)

  private def run(rows: Seq[(Long, Long, Timestamp, String)],
                  gapMicros: Long = 3600000000L) =
    SequenceMatch.firstCleanMatch(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        steps = Seq("a", "b", "c"), excluded = Seq("x"),
        maxGapMicros = gapMicros)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Boolean]("matched"),
        Option(r.getAs[java.lang.Long]("start_id")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("end_id")).map(_.toLong)))).toMap

  test("clean path matches; ids span first and last matched steps") {
    val m = run(Seq(
      ev(1, 7, "2024-01-01 09:00:00", "a"),
      ev(2, 7, "2024-01-01 09:10:00", "b"),
      ev(3, 7, "2024-01-01 09:20:00", "c")))
    assert(m(7L) == ((true, Some(1L), Some(3L))))
  }

  test("an excluded event between matched steps aborts; a later clean run still matches") {
    val m = run(Seq(
      ev(1, 7, "2024-01-01 09:00:00", "a"),
      ev(2, 7, "2024-01-01 09:05:00", "x"), // abort
      ev(3, 7, "2024-01-01 09:10:00", "b"), // ignored (stage 0)
      ev(4, 7, "2024-01-01 09:20:00", "a"), // re-anchor
      ev(5, 7, "2024-01-01 09:30:00", "b"),
      ev(6, 7, "2024-01-01 09:40:00", "c")))
    assert(m(7L) == ((true, Some(4L), Some(6L))))
    // excluded BEFORE the anchor is harmless
    val m2 = run(Seq(
      ev(1, 8, "2024-01-01 08:00:00", "x"),
      ev(2, 8, "2024-01-01 09:00:00", "a"),
      ev(3, 8, "2024-01-01 09:10:00", "b"),
      ev(4, 8, "2024-01-01 09:20:00", "c")))
    assert(m2(8L)._1)
  }

  test("gap violation resets; the late step re-anchors only if it is a first step") {
    // b arrives 2h after a (gap 1h): partial dies, b is not an anchor
    val m = run(Seq(
      ev(1, 7, "2024-01-01 09:00:00", "a"),
      ev(2, 7, "2024-01-01 11:30:00", "b"),
      ev(3, 7, "2024-01-01 11:40:00", "c")))
    assert(m(7L) == ((false, None, None)))
    // a -> (2h) -> a: the late event IS an anchor, match continues from it
    val m2 = run(Seq(
      ev(1, 9, "2024-01-01 09:00:00", "a"),
      ev(2, 9, "2024-01-01 09:30:00", "b"),
      ev(3, 9, "2024-01-01 12:00:00", "a"),
      ev(4, 9, "2024-01-01 12:10:00", "b"),
      ev(5, 9, "2024-01-01 12:20:00", "c")))
    assert(m2(9L) == ((true, Some(3L), Some(5L))))
  }

  test("first match freezes: later excluded events cannot unmatch it") {
    val m = run(Seq(
      ev(1, 7, "2024-01-01 09:00:00", "a"),
      ev(2, 7, "2024-01-01 09:10:00", "b"),
      ev(3, 7, "2024-01-01 09:20:00", "c"),
      ev(4, 7, "2024-01-01 09:30:00", "x"),
      ev(5, 7, "2024-01-01 09:40:00", "a")))
    assert(m(7L) == ((true, Some(1L), Some(3L))))
  }

  test("later-step events while at an earlier stage are ignored; config guards") {
    val m = run(Seq(
      ev(1, 7, "2024-01-01 09:00:00", "c"),
      ev(2, 7, "2024-01-01 09:05:00", "b"),
      ev(3, 7, "2024-01-01 09:10:00", "a"),
      ev(4, 7, "2024-01-01 09:20:00", "b"),
      ev(5, 7, "2024-01-01 09:30:00", "c")))
    assert(m(7L) == ((true, Some(3L), Some(5L))))
    intercept[IllegalArgumentException] {
      SequenceMatch.firstCleanMatch(
        Seq(ev(1, 1, "2024-01-01 00:00:00", "a")).toDF("event_id", "user_id", "ts", "event_type"),
        steps = Seq("a", "b"), excluded = Seq("a"), maxGapMicros = 1L)
    }
    intercept[IllegalArgumentException] {
      SequenceMatch.firstCleanMatch(
        Seq(ev(1, 1, "2024-01-01 00:00:00", "a")).toDF("event_id", "user_id", "ts", "event_type"),
        steps = Seq("a"), excluded = Seq("x"), maxGapMicros = 1L)
    }
  }
}
