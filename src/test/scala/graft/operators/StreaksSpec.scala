package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaks: gaps-and-islands runs, duplicate-day collapse, month/year
  * boundary runs, NULL contracts.
  */
class StreaksSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("hand-checked runs: two streaks with a gap, duplicates collapse") {
    val df = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-02")), (1L, d("2024-01-02")),
      (1L, d("2024-01-03")), (1L, d("2024-01-07")), (1L, d("2024-01-08")),
      (2L, d("2024-03-15"))
    ).toDF("user_id", "day")
    val got = Streaks.activityStreaks(df, "user_id", "day")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((5L, 2L, 3L))) // days {1,2,3,7,8}: runs of 3 and 2
    assert(got(2L) == ((1L, 1L, 1L)))
  }

  test("streaks cross month and year boundaries") {
    val df = Seq(
      (1L, d("2023-12-30")), (1L, d("2023-12-31")),
      (1L, d("2024-01-01")), (1L, d("2024-01-02"))
    ).toDF("user_id", "day")
    val got = Streaks.activityStreaks(df, "user_id", "day").head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((4L, 1L, 4L)))
  }

  test("timestamps truncate to days; NULL keys and dates drop") {
    val df = Seq(
      (Some(1L), Some(java.sql.Timestamp.valueOf("2024-01-01 09:00:00"))),
      (Some(1L), Some(java.sql.Timestamp.valueOf("2024-01-01 23:59:59"))),
      (Some(1L), None),
      (None, Some(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")))
    ).toDF("user_id", "ts")
    val got = Streaks.activityStreaks(df, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L)))
  }
}
