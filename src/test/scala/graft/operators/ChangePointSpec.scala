package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mean-shift scan: tent peak at the step, flat-series zero, earliest-i
  * tiebreak, and the whale-magnitude decimal path.
  */
class ChangePointSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("step change peaks exactly at the shift point") {
    // 4 samples at 0 then 4 at 100: D_i = n·P_i − i·T peaks at i=4
    // (|8·0 − 4·400| = 1600; at i=3: |0 − 3·400| = 1200; i=5: |8·100 − 5·400| = 1200)
    val df = (1 to 8).map(i =>
      ("g", d(f"2024-01-${i}%02d"), i.toLong, if (i <= 4) 0L else 100L))
      .toDF("grp", "dt", "id", "v")
    val got = ChangePoint.meanShiftScan(df, "grp", "dt", "v", "id").head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((8L, 1600L, 4L)))
  }

  test("flat series scores zero; ties resolve to the earliest index") {
    val df = (1 to 5).map(i => ("g", d(f"2024-01-${i}%02d"), i.toLong, 7L))
      .toDF("grp", "dt", "id", "v")
    val got = ChangePoint.meanShiftScan(df, "grp", "dt", "v", "id").head()
    // every prefix of a constant series deviates 0 → max 0 at earliest i=1
    assert((got.getLong(2), got.getLong(3)) == ((0L, 1L)))
  }

  test("groups scan independently; NULLs drop; float rejected") {
    val df = Seq(
      ("a", Some(d("2024-01-01")), 1L, Some(0L)),
      ("a", Some(d("2024-01-02")), 2L, Some(10L)),
      ("a", None, 3L, Some(99L)),
      ("b", Some(d("2024-01-01")), 1L, None),
      ("b", Some(d("2024-01-02")), 2L, Some(5L)),
      ("b", Some(d("2024-01-03")), 3L, Some(5L))
    ).toDF("grp", "dt", "id", "v")
    val got = ChangePoint.meanShiftScan(df, "grp", "dt", "v", "id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a: [0, 10] → D_1 = |2·0 − 1·10| = 10; b: [5, 5] flat → 0
    assert(got == Map("a" -> ((2L, 10L)), "b" -> ((2L, 0L))))
    intercept[IllegalArgumentException] {
      ChangePoint.meanShiftScan(df.withColumn("v", col("v").cast("double")),
        "grp", "dt", "v", "id")
    }
  }
}
