package graft.llm

import graft.SparkSpec

/** Markov next-event backtest: destination-side split, argmax with
  * lexicographic tie, zero-test NULL accuracy, unseen-from exclusion.
  */
class MarkovBacktestSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hand case: trained predictions scored on post-cut transitions") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 01:00:00"), "A"),
      (2L, 1L, ts("2024-01-01 02:00:00"), "B"),
      (3L, 1L, ts("2024-01-01 03:00:00"), "A"),
      (4L, 1L, ts("2024-01-01 04:00:00"), "B"),
      (5L, 1L, ts("2024-01-01 05:00:00"), "C"),
      (6L, 2L, ts("2024-01-01 01:30:00"), "A"),
      (7L, 2L, ts("2024-01-01 02:30:00"), "A"),
      (8L, 2L, ts("2024-01-01 03:30:00"), "B"),
      (9L, 2L, ts("2024-01-01 04:30:00"), "B")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = MarkovBacktest.backtest(events, "2024-01-01 04:00:00")
      .orderBy("from_type").collect()
    assert(got.length == 2)
    // from A: train A→B ×2, A→A ×1 → predict B; test A→B ×1 → 100%
    assert((got(0).getString(0), got(0).getString(1), got(0).getLong(2),
      got(0).getLong(3), got(0).getLong(4), got(0).getLong(5)) ==
      (("A", "B", 3L, 1L, 1L, 10000L)))
    // from B: train B→A ×1 → predict A; test B→C, B→B → 0/2
    assert((got(1).getString(0), got(1).getString(1), got(1).getLong(2),
      got(1).getLong(3), got(1).getLong(4), got(1).getLong(5)) ==
      (("B", "A", 1L, 2L, 0L, 0L)))
  }

  test("count tie elects the lexicographically smallest successor") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 01:00:00"), "X"),
      (2L, 1L, ts("2024-01-01 02:00:00"), "b"),
      (3L, 2L, ts("2024-01-01 01:00:00"), "X"),
      (4L, 2L, ts("2024-01-01 02:00:00"), "a")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = MarkovBacktest.backtest(events, "2024-01-02 00:00:00")
      .orderBy("from_type").collect()
    assert(got.length == 1)
    assert((got(0).getString(0), got(0).getString(1)) == (("X", "a")))
    // everything trained, nothing to test → NULL accuracy, not 0/0
    assert(got(0).getLong(3) == 0L)
    assert(got(0).isNullAt(5))
  }

  test("a from-type seen only after the cut carries no model and drops") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 01:00:00"), "A"),
      (2L, 1L, ts("2024-01-01 02:00:00"), "A"),
      // Z→A lands after the cut: Z was never trained
      (3L, 1L, ts("2024-01-02 01:00:00"), "Z"),
      (4L, 1L, ts("2024-01-02 02:00:00"), "A")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = MarkovBacktest.backtest(events, "2024-01-02 00:00:00")
      .collect()
    assert(got.map(_.getString(0)).toSet == Set("A"))
    // A's one test transition is A→Z (dest ts after cut)... dest of
    // (A@02:00 → Z@01:00+1d) is post-cut → test; prediction A→A misses
    val a = got.head
    assert((a.getLong(2), a.getLong(3), a.getLong(4)) == ((1L, 1L, 0L)))
  }
}
