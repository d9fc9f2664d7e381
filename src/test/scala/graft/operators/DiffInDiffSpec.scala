package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DiD: hand-checked cell algebra, exact micro truncation under the
  * sign-split law, and the four-cell guard.
  */
class DiffInDiffSpec extends SparkSpec {

  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = DiffInDiff.did(df, "t", "p", "v").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
  }

  test("hand case: common trend cancels, treatment effect remains") {
    // treat pre mean 5 -> post mean 15 (delta 10); ctrl 6 -> 10 (delta 4)
    val df = Seq(
      (true, true, 10L), (true, true, 20L), (true, false, 5L),
      (false, true, 8L), (false, true, 12L), (false, false, 6L))
      .toDF("t", "p", "v")
    assert(row(df) ==
      ((2L, 1L, 2L, 1L, 10000000L, 4000000L, 6000000L)))
  }

  test("fractional means and a negative estimate stay exact") {
    val df = Seq(
      (true, true, 1L), (true, true, 2L), (true, false, 1L),
      (false, true, 2L), (false, false, 1L))
      .toDF("t", "p", "v")
    // treat 1 -> 1.5 (+0.5), ctrl 1 -> 2 (+1): did = -0.5
    assert(row(df) ==
      ((2L, 1L, 1L, 1L, 500000L, 1000000L, -500000L)))
  }

  test("thirds truncate under the sign-split law (symmetric magnitudes)") {
    val pos = Seq(
      (true, true, 1L), (true, true, 1L), (true, true, 2L),
      (true, false, 1L), (false, true, 1L), (false, false, 1L))
      .toDF("t", "p", "v")
    // treat 1 -> 4/3: delta 1/3 -> 333333 (truncated); ctrl flat
    val got = row(pos)
    assert((got._5, got._6, got._7) == ((333333L, 0L, 333333L)))
    val neg = Seq(
      (true, true, 0L), (true, true, 1L), (true, true, 1L),
      (true, false, 1L), (false, true, 1L), (false, false, 1L))
      .toDF("t", "p", "v")
    // delta -1/3 -> -333333: sign-split magnitude matches +1/3 exactly
    val got2 = row(neg)
    assert((got2._5, got2._7) == ((-333333L, -333333L)))
  }

  test("an empty cell fails loudly; NULL rows drop first") {
    val df = Seq(
      (Some(true), Some(true), Some(10L)),
      (Some(true), Some(false), Some(5L)),
      (Some(false), Some(true), Some(8L)),
      (None, Some(false), Some(6L)), (Some(false), None, Some(6L)))
      .toDF("t", "p", "v")
    val ex = intercept[Exception] { DiffInDiff.did(df, "t", "p", "v").head() }
    assert(ex.getMessage.contains("cells populated") ||
      Option(ex.getCause).exists(_.getMessage.contains("cells populated")))
    intercept[IllegalArgumentException] {
      DiffInDiff.did(df.withColumn("v", col("v").cast("double")), "t", "p", "v")
    }
  }
}
