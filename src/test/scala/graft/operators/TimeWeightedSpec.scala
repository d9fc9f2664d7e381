package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Time-weighted mean: hand-checked step integral, burst robustness,
  * tie/NULL/single-sample contracts, float rejection.
  */
class TimeWeightedSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hand-checked: value 10 for 3s then 40 for 1s → twa 17") {
    val df = Seq(
      ("g", ts("2024-01-01 00:00:00"), 1L, 10L),
      ("g", ts("2024-01-01 00:00:03"), 2L, 40L),
      ("g", ts("2024-01-01 00:00:04"), 3L, 999L) // last: no duration
    ).toDF("grp", "t", "id", "v")
    val got = TimeWeighted.timeWeightedMean(df, "grp", "t", "v", "id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // (10*3e6 + 40*1e6) / 4e6 = 70/4 = 17 (truncating)
    assert(got.toSeq == Seq((2L, 4000000L, 17L)))
  }

  test("burst of samples does not overweight: TWA beats AVG") {
    // value 100 held for 10s (one sample), then 0 sampled 10× in 1s:
    // row-AVG ≈ 9, but the level was 100 for 10/11 of the time
    val burst = (0 until 10).map(i =>
      ("g", new java.sql.Timestamp(ts("2024-01-01 00:00:10").getTime + i * 100L),
        (i + 2).toLong, 0L))
    val df = (Seq(("g", ts("2024-01-01 00:00:00"), 1L, 100L)) ++ burst)
      .toDF("grp", "t", "id", "v")
    val twa = TimeWeighted.timeWeightedMean(df, "grp", "t", "v", "id")
      .head().getLong(3)
    // 100 · 10s / 10.9s = 91 (truncating)
    assert(twa == 91L, s"got $twa")
  }

  test("duplicate timestamps: (ts, id) total order, zero-duration segment") {
    val df = Seq(
      ("g", ts("2024-01-01 00:00:00"), 1L, 10L),
      ("g", ts("2024-01-01 00:00:00"), 2L, 77L), // 0-duration under id order
      ("g", ts("2024-01-01 00:00:02"), 3L, 30L)
    ).toDF("grp", "t", "id", "v")
    val got = TimeWeighted.timeWeightedMean(df, "grp", "t", "v", "id").head()
    // id 1 holds 0us, id 2 holds 2s of 77: twa = 77
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((2L, 2000000L, 77L)))
  }

  test("single-sample groups drop; negative means sign-split exactly") {
    val df = Seq(
      ("solo", ts("2024-01-01 00:00:00"), 1L, 5L),
      ("neg", ts("2024-01-01 00:00:00"), 1L, -7L),
      ("neg", ts("2024-01-01 00:00:03"), 2L, 0L)
    ).toDF("grp", "t", "id", "v")
    val got = TimeWeighted.timeWeightedMean(df, "grp", "t", "v", "id")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("neg" -> -7L))
  }

  test("all-samples-one-timestamp group drops (no ANSI division by zero)") {
    val df = Seq(
      ("zero", ts("2024-01-01 00:00:00"), 1L, 5L),
      ("zero", ts("2024-01-01 00:00:00"), 2L, 7L),
      ("live", ts("2024-01-01 00:00:00"), 1L, 3L),
      ("live", ts("2024-01-01 00:00:01"), 2L, 9L)
    ).toDF("grp", "t", "id", "v")
    val got = TimeWeighted.timeWeightedMean(df, "grp", "t", "v", "id")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("live" -> 3L), "zero-duration group must drop, not throw")
  }

  test("float value column is rejected loudly") {
    val df = Seq(("g", ts("2024-01-01 00:00:00"), 1L, 1.5)).toDF("grp", "t", "id", "v")
    intercept[IllegalArgumentException] {
      TimeWeighted.timeWeightedMean(df, "grp", "t", "v", "id")
    }
  }
}
