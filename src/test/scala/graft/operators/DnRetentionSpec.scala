package graft.operators

import graft.SparkSpec

import java.sql.Timestamp

/** Dn retention: bounded-return windows, censoring NULLs, duplicate-day
  * collapse.
  */
class DnRetentionSpec extends SparkSpec {

  import spark.implicits._

  private def ev(u: Long, d: String) = (u, Timestamp.valueOf(d + " 12:00:00"))

  test("hand case: d1/d7 flags and the censoring horizon") {
    // horizon = 2024-01-20.
    // cohort Jan-1: u1 returns day+1 (d1 yes), u2 returns day+5 (d7 only)
    // cohort Jan-18: u3 returns day+2 — d1 no; d7 window ends Jan-25 >
    // horizon → d7 NULL for that cohort
    val rows = Seq(
      ev(1, "2024-01-01"), ev(1, "2024-01-02"),
      ev(2, "2024-01-01"), ev(2, "2024-01-06"),
      ev(3, "2024-01-18"), ev(3, "2024-01-20"))
      .toDF("user_id", "ts")
    val got = Retention.dnRetention(rows, "user_id", "ts", Seq(1, 7))
      .orderBy("cohort_day").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val jan1 = 19723L // epoch days to 2024-01-01 (TZ-free constant)
    val jan18 = jan1 + 17
    assert(got.toSeq == Seq(
      (jan1, 2L, Some(1L), Some(2L)),
      (jan18, 1L, Some(0L), None)))
  }

  test("duplicate same-day events never double-count a user") {
    val rows = Seq(ev(1, "2024-01-01"), ev(1, "2024-01-01"),
      ev(1, "2024-01-02"), ev(9, "2024-01-09"))
      .toDF("user_id", "ts")
    val got = Retention.dnRetention(rows, "user_id", "ts", Seq(1))
      .orderBy("cohort_day").collect()
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 1L)
  }
}
