package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lift-table contracts: hand-checked rates and lifts, zero-positive
  * NULL lift, bucket sizing, partitioning independence.
  */
class CalibrationSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked k=2 rates and lifts") {
    // scores 1..10; label = score > 8 (2 positives, both in top half)
    val df = (1L to 10L).map(i => (i, i, if (i > 8) 1 else 0)).toDF("id", "s", "y")
    val got = Calibration.liftTable(df, "s", "id", col("y") === 1, k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bucket 1: n=5 pos=0 rate 0 lift 0; bucket 2: n=5 pos=2 rate 0.4,
    // base rate 0.2 -> lift 2.0
    assert(got(1L) == ((5L, 0L, 0L, 0L)))
    assert(got(2L) == ((5L, 2L, 400000L, 2000000L)))
  }

  test("zero positives overall: lift NULL, rates zero") {
    val df = (1L to 6L).map(i => (i, i, 0)).toDF("id", "s", "y")
    val rows = Calibration.liftTable(df, "s", "id", col("y") === 1, k = 3).collect()
    assert(rows.length == 3)
    rows.foreach { r => assert(r.getLong(3) == 0L && r.isNullAt(4)) }
  }

  test("partitioning independence") {
    val df = (1L to 200L).map(i => (i, (i * 37) % 100, if (i % 7 == 0) 1 else 0))
      .toDF("id", "s", "y")
    def m(p: Int) = Calibration.liftTable(df.repartition(p), "s", "id",
        col("y") === 1, k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(m(1) == m(7))
  }
}
