package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interval union: overlap collapse, containment, chains, span counts,
  * degenerate/NULL contracts.
  */
class IntervalCoverageSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("overlaps count once; disjoint spans add; containment adds nothing") {
    val df = Seq(
      // [0,10) and [5,15): union [0,15) = 15 min
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      (1L, ts("2024-01-01 00:05:00"), ts("2024-01-01 00:15:00")),
      // contained [6,8): nothing new
      (1L, ts("2024-01-01 00:06:00"), ts("2024-01-01 00:08:00")),
      // disjoint [30,40): +10 min, second span
      (1L, ts("2024-01-01 00:30:00"), ts("2024-01-01 00:40:00"))
    ).toDF("k", "f", "t")
    val got = IntervalCoverage.coverage(df, "k", "f", "t").head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((4L, 2L, 25L * 60 * 1000000L)))
  }

  test("a chain that only touches at endpoints stays one span ([a,b) semantics)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00"))
    ).toDF("k", "f", "t")
    val got = IntervalCoverage.coverage(df, "k", "f", "t").head()
    // [0,10) + [10,20) are contiguous under half-open semantics: one
    // merged on-period of 20 minutes
    assert(got.getLong(3) == 20L * 60 * 1000000L)
    assert(got.getLong(2) == 1L)
  }

  test("degenerate and NULL intervals carry no coverage") {
    val df = Seq(
      (1L, Some(ts("2024-01-01 00:00:00")), Some(ts("2024-01-01 00:00:00"))), // empty
      (1L, Some(ts("2024-01-01 01:00:00")), Some(ts("2024-01-01 00:00:00"))), // inverted
      (1L, None, Some(ts("2024-01-01 02:00:00"))),
      (1L, Some(ts("2024-01-01 03:00:00")), Some(ts("2024-01-01 03:01:00")))
    ).toDF("k", "f", "t")
    val got = IntervalCoverage.coverage(df, "k", "f", "t").head()
    assert((got.getLong(1), got.getLong(3)) == ((1L, 60L * 1000000L)))
  }
}
