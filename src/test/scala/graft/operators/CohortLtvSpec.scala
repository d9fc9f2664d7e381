package graft.operators

import graft.SparkSpec

/** Cohort LTV: hand-checked curves, dense-age zero rows, shared
  * horizon, refund dip sign-split, NULL contracts.
  */
class CohortLtvSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("hand case: two cohorts, dense ages to the shared horizon") {
    val orders = Seq(
      (1L, d("2024-01-05"), 100L), (1L, d("2024-03-20"), 50L),
      (2L, d("2024-01-15"), 200L),
      (3L, d("2024-02-10"), 80L))
      .toDF("cust", "dt", "cents")
    val got = CohortLtv.curves(orders, "cust", "dt", "cents")
      .orderBy("cohort_month", "age_months").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("2024-01", 0L, 2L, 300L, 300L, 150L),
      ("2024-01", 1L, 2L, 0L, 300L, 150L), // no revenue → explicit zero row
      ("2024-01", 2L, 2L, 50L, 350L, 175L),
      ("2024-02", 0L, 1L, 80L, 80L, 80L),
      ("2024-02", 1L, 1L, 0L, 80L, 80L))) // horizon shared across cohorts
  }

  test("a refund dip goes negative with the sign-split division") {
    val orders = Seq(
      (1L, d("2024-01-05"), 100L),
      (2L, d("2024-01-06"), 0L),
      (1L, d("2024-02-05"), -301L))
      .toDF("cust", "dt", "cents")
    val got = CohortLtv.curves(orders, "cust", "dt", "cents")
      .orderBy("age_months").collect()
    // age 1: cum = −201 over size 2 → trunc toward zero = −100
    assert((got(1).getLong(4), got(1).getLong(5)) == ((-201L, -100L)))
  }

  test("December cohort formats correctly and NULL rows drop") {
    val orders = Seq(
      (Some(1L), Some(d("2023-12-25")), 40L),
      (None, Some(d("2023-12-26")), 999L),
      (Some(2L), None, 999L))
      .toDF("cust", "dt", "cents")
    val got = CohortLtv.curves(orders, "cust", "dt", "cents").collect()
    assert(got.length == 1)
    assert((got(0).getString(0), got(0).getLong(3)) == (("2023-12", 40L)))
  }
}
