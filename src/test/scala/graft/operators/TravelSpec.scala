package graft.operators

import graft.SparkSpec

import java.sql.Timestamp

/** Impossible travel: cross-multiplied threshold exactness, teleport
  * vs stationary Δt=0, per-user independence.
  */
class TravelSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, u: Long, ts: String, x: Long, y: Long) =
    (id, u, Timestamp.valueOf(ts), x, y)

  test("exact boundary: speed must EXCEED the bound to flag") {
    // 1000 units in 1 second at vmax 1 unit/ms (1/1000 units/us):
    // dist2·den² = 1e6·1e6 = 1e12; num²·dt² = 1·1e12 → equal, NOT flagged
    val rows = Seq(
      ev(1, 7, "2024-01-01 09:00:00", 0, 0),
      ev(2, 7, "2024-01-01 09:00:01", 1000, 0),
      // 1001 units in 1 second: flagged
      ev(3, 7, "2024-01-01 09:00:02", 2001, 0))
      .toDF("event_id", "user_id", "ts", "x", "y")
    val got = Travel.impossible(rows, "user_id", "ts", "event_id",
        "x", "y", vNum = 1, vDen = 1000)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 3L)))
  }

  test("teleportation: dt=0 at different coordinates flags; same spot doesn't") {
    val rows = Seq(
      ev(1, 7, "2024-01-01 09:00:00", 0, 0),
      ev(2, 7, "2024-01-01 09:00:00", 5, 5),   // teleport
      ev(3, 8, "2024-01-01 09:00:00", 9, 9),
      ev(4, 8, "2024-01-01 09:00:00", 9, 9))   // stationary tie
      .toDF("event_id", "user_id", "ts", "x", "y")
    val got = Travel.impossible(rows, "user_id", "ts", "event_id",
        "x", "y", vNum = 1, vDen = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq((7L, 2L, 0L)))
  }

  test("users are independent; NULL coordinates drop the event") {
    val rows = Seq(
      (1L, Some(7L), Timestamp.valueOf("2024-01-01 09:00:00"), Some(0L), Some(0L)),
      (2L, Some(8L), Timestamp.valueOf("2024-01-01 09:00:00"), Some(99999L), Some(0L)),
      (3L, Some(7L), Timestamp.valueOf("2024-01-01 09:00:01"), None, Some(1L)))
      .toDF("event_id", "user_id", "ts", "x", "y")
    assert(Travel.impossible(rows, "user_id", "ts", "event_id",
      "x", "y", 1, 1000).count() == 0L)
  }
}
