package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trailing actives: a user counts once per window, windows slide daily,
  * window=1 reduces to DAU, NULL contracts.
  */
class TrailingActivesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")

  test("a user active twice in one window is one WAU; windows slide") {
    val df = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-02")), // same user, 2 days
      (2L, ts("2024-01-05")),
      (1L, ts("2024-01-01")) // duplicate event same day
    ).toDF("user_id", "t")
    val got = TrailingActives.trailingActives(df, "t", "user_id", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got == Map(
      "2024-01-01" -> 1L, // {1}
      "2024-01-02" -> 1L, // {1} (both active days inside, one user)
      "2024-01-03" -> 1L, // window [1..3] still holds user 1
      "2024-01-04" -> 1L, // window [2..4] holds user 1's Jan-2 activity
      "2024-01-05" -> 1L, // window [3..5]: only user 2
      "2024-01-06" -> 1L, // [4..6]: user 2
      "2024-01-07" -> 1L  // [5..7]: user 2
    ))
  }

  test("windowDays = 1 is plain DAU; overlapping users sum distinctly") {
    val df = Seq(
      (1L, ts("2024-01-01")), (2L, ts("2024-01-01")), (1L, ts("2024-01-02"))
    ).toDF("user_id", "t")
    val dau = TrailingActives.trailingActives(df, "t", "user_id", windowDays = 1)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(dau == Map("2024-01-01" -> 2L, "2024-01-02" -> 1L))
    val wau = TrailingActives.trailingActives(df, "t", "user_id", windowDays = 2)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(wau == Map("2024-01-01" -> 2L, "2024-01-02" -> 2L, "2024-01-03" -> 1L))
  }

  test("NULL keys and timestamps drop") {
    val df = Seq(
      (Some(1L), Some(ts("2024-01-01"))), (None, Some(ts("2024-01-01"))),
      (Some(2L), None)
    ).toDF("user_id", "t")
    val got = TrailingActives.trailingActives(df, "t", "user_id", windowDays = 1)
      .collect().map(r => r.getLong(1))
    assert(got.toSeq == Seq(1L))
  }
}
