package graft.llm

import graft.SparkSpec

/** Debounce: trailing-extend burst chains, per-(key,type) independence,
  * tie ordering, burst audit stats, unrankable-row contract.
  */
class DebounceSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  test("a storm chaining under the cooldown is ONE burst (trailing-extend)") {
    // events at 0s, 5s, 10s with an 8s cooldown: each gap is 5s < 8s, so
    // the burst extends past any fixed window from the leader
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "click"),
      (2L, 1L, ts("2024-01-01 00:00:05"), "click"),
      (3L, 1L, ts("2024-01-01 00:00:10"), "click"),
      (4L, 1L, ts("2024-01-01 00:00:19"), "click") // 9s after #3 → new burst
    ).toDF("event_id", "user_id", "ts", "event_type")
    val kept = Debounce.debounced(events, 8000000L)
      .orderBy("event_id").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L, 4L))
    val bursts = Debounce.burstStats(events, 8000000L)
      .orderBy("first_us").collect()
    assert(bursts.length == 2)
    assert((bursts(0).getLong(4), bursts(0).getLong(5)) ==
      ((3L, 10000000L)))
    assert((bursts(1).getLong(4), bursts(1).getLong(5)) == ((1L, 0L)))
    assert(bursts(0).getLong(2) == us("2024-01-01 00:00:00"))
  }

  test("types and keys debounce independently") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "click"),
      (2L, 1L, ts("2024-01-01 00:00:01"), "view"), // other type → kept
      (3L, 2L, ts("2024-01-01 00:00:01"), "click") // other user → kept
    ).toDF("event_id", "user_id", "ts", "event_type")
    assert(Debounce.debounced(events, 8000000L).count() == 3L)
  }

  test("equal timestamps order by id: the lowest id leads the burst") {
    val events = Seq(
      (7L, 1L, ts("2024-01-01 00:00:00"), "click"),
      (5L, 1L, ts("2024-01-01 00:00:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val kept = Debounce.debounced(events, 8000000L).collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("unrankable rows drop; a gap exactly at the cooldown starts a burst") {
    val events = Seq(
      (Some(1L), 1L, Some(ts("2024-01-01 00:00:00")), "click"),
      (None, 1L, Some(ts("2024-01-01 00:00:01")), "click"),
      (Some(3L), 1L, None, "click"),
      (Some(4L), 1L, Some(ts("2024-01-01 00:00:08")), "click") // == cooldown
    ).toDF("event_id", "user_id", "ts", "event_type")
    val kept = Debounce.debounced(events, 8000000L).collect()
    assert(kept.map(_.getLong(0)).toSet == Set(1L, 4L))
  }
}
