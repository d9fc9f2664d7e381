package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Kaplan–Meier in log space: hand per-term floors, the ln(1) = 0
  * no-churn shortcut, and the exact-zero-survival NULL marker.
  */
class KmSurvivalSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("hand curve: floored log terms accumulate exactly") {
    // A churns at age 0, B at age 1, C and D censored at the horizon
    val events = Seq(
      ("A", ts("2020-01-05")),
      ("B", ts("2020-01-10")), ("B", ts("2020-02-10")),
      ("C", ts("2020-01-15")), ("C", ts("2020-03-15")),
      ("D", ts("2020-03-20")))
      .toDF("user_id", "ts")
    val got = Churn.kmSurvival(events, "user_id", "ts")
      .orderBy("age_months").collect()
      .map(r => (r.getAs[Long]("age_months"), r.getAs[Long]("at_risk"),
        r.getAs[Long]("churned"), r.getAs[Long]("ln_surv_q6")))
    // ln(3/4)*1e6 floors to -287683; ln(1/2)*1e6 floors to -693148
    assert(got.toSeq == Seq(
      (0L, 4L, 1L, -287683L),
      (1L, 2L, 1L, -980831L),
      (2L, 1L, 0L, -980831L)))
  }

  test("survival hitting exact zero reports NULL from that age on") {
    // A churns at age 1 as the last at-risk user: S(1) = 0
    val events = Seq(
      ("A", ts("2020-01-05")), ("A", ts("2020-02-05")),
      ("D", ts("2020-03-20")))
      .toDF("user_id", "ts")
    val got = Churn.kmSurvival(events, "user_id", "ts")
      .orderBy("age_months").collect()
    assert(got(0).getAs[Long]("ln_surv_q6") == 0L)   // age 0: no churn
    assert(got(1).isNullAt(got(1).fieldIndex("ln_surv_q6")))
  }
}
