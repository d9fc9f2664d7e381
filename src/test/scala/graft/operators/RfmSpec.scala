package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFM contracts: hand-checked aggregates and scores, recency inversion,
  * tie determinism, partitioning independence.
  */
class RfmSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private val orders = Seq(
    // cust 1: recent, frequent, rich; cust 2: stale, rare, poor;
    // cust 3: middle on every axis
    (1L, d("2024-03-10"), 100L), (1L, d("2024-03-20"), 200L), (1L, d("2024-03-30"), 300L),
    (2L, d("2024-01-01"), 50L),
    (3L, d("2024-02-15"), 120L), (3L, d("2024-02-20"), 80L)
  ).toDF("cust", "odate", "cents")

  test("hand-checked aggregates and k=3 scores (recency inverted)") {
    val got = Rfm.rfmScores(orders, "cust", "odate", col("cents"), k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // max last date = 2024-03-30; r_days: c1=0, c2=89, c3=39 (leap Feb)
    // r_days asc: c1,c3,c2 -> buckets 1,2,3 -> r_score 3,2,1
    // f_n: c2=1, c3=2, c1=3 -> buckets 1,2,3 -> f_score c2=1 c3=2 c1=3
    // m_cents: c2=50, c3=200, c1=600 -> m_score c2=1 c3=2 c1=3
    assert(got(1L) == ((0L, 3L, 600L, 3L, 3L, 3L, 333L)))
    assert(got(2L) == ((89L, 1L, 50L, 1L, 1L, 1L, 111L)))
    assert(got(3L) == ((39L, 2L, 200L, 2L, 2L, 2L, 222L)))
  }

  test("ties split deterministically by entity id") {
    val tied = Seq(
      (1L, d("2024-01-10"), 10L), (2L, d("2024-01-10"), 10L),
      (3L, d("2024-01-10"), 10L), (4L, d("2024-01-10"), 10L)
    ).toDF("cust", "odate", "cents")
    val got = Rfm.rfmScores(tied, "cust", "odate", col("cents"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap // f_score
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("partitioning independence") {
    def m(p: Int) = Rfm.rfmScores(orders.repartition(p), "cust", "odate",
        col("cents"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(7)).toMap
    assert(m(1) == m(5))
  }
}
