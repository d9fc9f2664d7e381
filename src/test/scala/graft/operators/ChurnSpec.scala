package graft.operators

import graft.SparkSpec

/** Churn hazard: hand-checked censoring algebra, dense spine, whale
  * collapse contract.
  */
class ChurnSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: horizon users are censored, never churned") {
    val ev = Seq(
      ("u1", "2024-01-15"), ("u1", "2024-02-10"), ("u1", "2024-03-05"),
      ("u2", "2024-01-20"),
      ("u3", "2024-02-01"), ("u3", "2024-03-20"),
      ("u4", "2024-03-02"))
      .toDF("user", "ts0")
      .selectExpr("user", "CAST(ts0 AS TIMESTAMP) AS ts")
    val got = Churn.hazardCurve(ev, "user", "ts")
      .orderBy("age_months").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // horizon = Mar: u2 churned at 0; u4 censored at 0; u3 censored at 1;
    // u1 censored at 2. at_risk reversed-cumulates 4 / 2 / 1.
    assert(got.toSeq == Seq(
      (0L, 4L, 1L, 1L, 25000000L),
      (1L, 2L, 0L, 1L, 0L),
      (2L, 1L, 0L, 1L, 0L)))
  }

  test("ages nobody exited at still show their at-risk population") {
    val ev = Seq(("a", "2024-01-01"), ("a", "2024-04-01"), ("b", "2024-04-05"))
      .toDF("user", "ts0")
      .selectExpr("user", "CAST(ts0 AS TIMESTAMP) AS ts")
    val got = Churn.hazardCurve(ev, "user", "ts")
      .orderBy("age_months").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a spans Jan->Apr (age 3, censored); b is Apr-only (age 0, censored);
    // ages 1 and 2 are explicit zero rows with a's at-risk mass
    assert(got.toSeq == Seq(
      (0L, 2L, 0L, 1L), (1L, 1L, 0L, 0L), (2L, 1L, 0L, 0L),
      (3L, 1L, 0L, 1L)))
  }

  test("duplicate activity months collapse; NULL rows drop") {
    val ev = Seq(
      (Some("a"), Some("2024-01-01")), (Some("a"), Some("2024-01-20")),
      (Some("a"), Some("2024-02-01")), (None, Some("2024-02-01")),
      (Some("b"), None))
      .toDF("user", "ts0")
      .selectExpr("user", "CAST(ts0 AS TIMESTAMP) AS ts")
    val got = Churn.hazardCurve(ev, "user", "ts").collect()
    assert(got.map(_.getLong(1)).max == 1L) // only user a survives the filter
  }

  test("Nelson-Aalen: per-term-floored rational hazard cumulates exactly") {
    // a churns at 0, b at 1, c censored at 2, d censored at 0:
    // at_risk 4/2/1 -> terms 250000, 500000, 0
    val ev = Seq(
      ("a", "2024-01-10"),
      ("b", "2024-01-05"), ("b", "2024-02-14"),
      ("c", "2024-01-02"), ("c", "2024-03-20"),
      ("d", "2024-03-02"))
      .toDF("user", "ts0")
      .selectExpr("user", "CAST(ts0 AS TIMESTAMP) AS ts")
    val got = Churn.nelsonAalen(ev, "user", "ts")
      .orderBy("age_months").collect()
      .map(r => (r.getAs[Long]("age_months"), r.getAs[Long]("na_q6"),
        r.getAs[Long]("na_var_q12")))
    assert(got.toSeq == Seq(
      (0L, 250000L, 62500000000L),
      (1L, 750000L, 312500000000L),
      (2L, 750000L, 312500000000L)))
  }
}
