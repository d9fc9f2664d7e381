package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deltas over the dense spine: calendar-exact lags, gap-day −100%,
  * zero-baseline NULL, sign-split basis points.
  */
class DeltasSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("gap day drops 100% and recovery divides by the zero-filled baseline") {
    val df = Seq(
      ("g", d("2024-01-01"), 100L),
      // Jan 2 missing entirely (outage)
      ("g", d("2024-01-03"), 50L)
    ).toDF("grp", "dt", "v")
    val got = Deltas.dayOverDay(df, "grp", "dt", "v")
      .collect().map(r => r.getDate(1).toString ->
        (r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(got("2024-01-01") == ((100L, None)))          // no baseline
    assert(got("2024-01-02") == ((0L, Some(-10000L))))   // −100% on the gap
    assert(got("2024-01-03")._2 == None,
      "recovering from a zero baseline has no percentage")
  }

  test("week-over-week is calendar days, not present rows") {
    // value doubles exactly one calendar week later, with sparse rows
    // in between that would corrupt a lag(7)-over-present-rows
    val df = Seq(
      ("g", d("2024-01-01"), 100L),
      ("g", d("2024-01-03"), 7L),
      ("g", d("2024-01-08"), 200L)
    ).toDF("grp", "dt", "v")
    val wow = Deltas.dayOverDay(df, "grp", "dt", "v")
      .where(col("day") === d("2024-01-08"))
      .head().getAs[Long]("wow_bp")
    assert(wow == 10000L, s"+100% vs the Jan-1 calendar baseline, got $wow")
  }

  test("negative changes truncate toward zero via the sign split") {
    val df = Seq(("g", d("2024-01-01"), 3L), ("g", d("2024-01-02"), 2L))
      .toDF("grp", "dt", "v")
    val dod = Deltas.dayOverDay(df, "grp", "dt", "v")
      .where(col("day") === d("2024-01-02"))
      .head().getAs[Long]("dod_bp")
    // −1/3 → −⌊10000/3⌋ = −3333 (magnitude floored, then signed)
    assert(dod == -3333L)
  }
}
