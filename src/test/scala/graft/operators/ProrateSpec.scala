package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proration: hand shares, exact reconciliation, negative sign-split,
  * span guards, NULL drops.
  */
class ProrateSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: 10 cents over 3 days front-loads the remainder") {
    val df = Seq((1L, 0L, 3L, 10L)).toDF("id", "s", "e", "v")
    val got = Prorate.daily(df, "s", "e", "v")
      .orderBy("period").collect()
      .map(r => (r.getAs[Long]("period"), r.getAs[Long]("share")))
    assert(got.toSeq == Seq((0L, 4L), (1L, 3L), (2L, 3L)))
  }

  test("reconciliation: shares sum to the amount exactly, every interval") {
    val df = (1L to 50L).map(i => (i, i % 7, i % 7 + 1 + i % 11, i * 13 - 300))
      .toDF("id", "s", "e", "v")
    val bad = Prorate.daily(df, "s", "e", "v")
      .groupBy("id", "v").agg(sum("share").as("tot"))
      .where(col("tot") =!= col("v")).count()
    assert(bad == 0L, "Σ shares must equal the amount for every interval")
  }

  test("negative amounts prorate by magnitude with the sign on every share") {
    val df = Seq((1L, 0L, 3L, -10L)).toDF("id", "s", "e", "v")
    val got = Prorate.daily(df, "s", "e", "v")
      .orderBy("period").collect().map(_.getAs[Long]("share"))
    assert(got.toSeq == Seq(-4L, -3L, -3L))
    assert(got.sum == -10L)
  }

  test("empty span raises; oversized span raises; at-bound passes") {
    val empty = Seq((1L, 5L, 5L, 10L)).toDF("id", "s", "e", "v")
    val e = intercept[Exception] {
      Prorate.daily(empty, "s", "e", "v").collect()
    }
    assert(e.getMessage.contains("empty/negative span"))
    val big = Seq((1L, 0L, 11L, 10L)).toDF("id", "s", "e", "v")
    val e2 = intercept[Exception] {
      Prorate.daily(big, "s", "e", "v", maxSpan = 10L).collect()
    }
    assert(e2.getMessage.contains("exceeds maxSpan"))
    assert(Prorate.daily(big, "s", "e", "v", maxSpan = 11L).count() == 11L)
  }

  test("NULL start/end/value rows drop") {
    val df = Seq((Some(0L), Some(2L), Some(4L)), (None, Some(2L), Some(4L)),
      (Some(0L), None, Some(4L)), (Some(0L), Some(2L), None))
      .toDF("s", "e", "v")
    assert(Prorate.daily(df, "s", "e", "v").count() == 2L)
  }
}
