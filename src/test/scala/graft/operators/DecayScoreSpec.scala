package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer half-life decay: exact halving per period, clamps, and null
  * pass-through.
  */
class DecayScoreSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Long, String)], halfLife: Int,
                  asOf: String = "2024-01-01"): Map[Long, Long] =
    DecayScore.withDecay(
        rows.toDF("id", "score", "d").withColumn("d", col("d").cast("date")),
        "score", "d", asOf, halfLife)
      .select("id", "decayed").as[(Long, Long)].collect().toMap

  test("halves once per elapsed half-life, exactly") {
    val got = run(Seq(
      (1L, 1000L, "2024-01-01"), // age 0 → 1000
      (2L, 1000L, "2023-07-06"), // age 179 < 180 → 1000
      (3L, 1000L, "2023-07-05"), // age 180 → 500
      (4L, 1000L, "2023-01-06"), // age 360 = exactly two half-lives → 250
      (5L, 1000L, "2023-01-05"), // age 361 → still shift 2 → 250
      (6L, 1000L, "2022-01-01")  // age 730 → 4 half-lives → 62
    ), halfLife = 180)
    assert(got === Map(1L -> 1000L, 2L -> 1000L, 3L -> 500L,
      4L -> 250L, 5L -> 250L, 6L -> 62L))
  }

  test("future dates clamp to no decay; huge ages clamp to shift 62") {
    val got = run(Seq(
      (1L, 1000L, "2030-01-01"),  // future → 1000
      (2L, Long.MaxValue, "1900-01-01")), halfLife = 1)
    assert(got(1L) === 1000L)
    assert(got(2L) === Long.MaxValue >> 62) // 45000+ days, clamped
  }

  test("null score or date passes through as null") {
    val df = Seq((1L, Some(10L), Some("2024-01-01")), (2L, None, Some("2024-01-01")),
      (3L, Some(10L), None)).toDF("id", "score", "d")
      .withColumn("d", col("d").cast("date"))
    val got = DecayScore.withDecay(df, "score", "d", "2024-01-01", 30)
      .select("id", "decayed").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("decay composes with aggregation deterministically") {
    val rows = (1 to 100).map(i => (i.toLong, 1000000L, f"2023-${i % 12 + 1}%02d-01"))
    val a = run(rows, 90).values.sum
    val b = run(rows, 90).values.sum
    assert(a === b)
  }
}
