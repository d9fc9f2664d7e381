package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Additive decomposition: hand trend/seasonal values, exact additive
  * identity, pmod season on negative indexes, dup raise, NULL contracts.
  */
class SeasonalDecompSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: flat series decomposes to trend only") {
    val df = (0L to 9L).map(i => ("g", i, 100L)).toDF("grp", "i", "x")
    val got = SeasonalDecomp.decompose(df, "grp", "i", "x",
        period = 3, halfWindow = 2)
      .orderBy("idx").collect()
    got.foreach { r =>
      assert(r.getAs[Long]("trend_q6") == 100000000L)
      assert(r.getAs[Long]("seasonal_q6") == 0L)
      assert(r.getAs[Long]("remainder_q6") == 0L)
    }
  }

  test("additive identity holds exactly on a noisy series") {
    val xs = (0 until 30).map(i => ((i * 37) % 101).toLong - 50L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("grp", "i", "x")
    val got = SeasonalDecomp.decompose(df, "grp", "i", "x",
        period = 7, halfWindow = 3)
      .orderBy("idx").collect()
    got.zipWithIndex.foreach { case (r, i) =>
      val sum = r.getAs[Long]("trend_q6") + r.getAs[Long]("seasonal_q6") +
        r.getAs[Long]("remainder_q6")
      assert(sum == xs(i) * 1000000L,
        s"identity broken at $i: $sum != ${xs(i) * 1000000L}")
    }
    // season indexes cycle 0..6
    assert(got.map(_.getAs[Long]("season")).toSeq ==
      (0 until 30).map(i => (i % 7).toLong))
  }

  test("edge windows are partial, declared: first cell's trend uses [0, k]") {
    // x = 0, 6, 12 with halfWindow 1: trend(0) = (0+6)/2 = 3
    val df = Seq(("g", 0L, 0L), ("g", 1L, 6L), ("g", 2L, 12L))
      .toDF("grp", "i", "x")
    val got = SeasonalDecomp.decompose(df, "grp", "i", "x",
        period = 2, halfWindow = 1)
      .orderBy("idx").collect().map(_.getAs[Long]("trend_q6"))
    assert(got.toSeq == Seq(3000000L, 6000000L, 9000000L))
  }

  test("negative indexes take the pmod season") {
    val df = Seq(("g", -3L, 1L), ("g", -2L, 2L), ("g", -1L, 3L), ("g", 0L, 4L))
      .toDF("grp", "i", "x")
    val got = SeasonalDecomp.decompose(df, "grp", "i", "x",
        period = 3, halfWindow = 1)
      .orderBy("idx").collect().map(_.getAs[Long]("season"))
    // -3 -> 0, -2 -> 1, -1 -> 2, 0 -> 0
    assert(got.toSeq == Seq(0L, 1L, 2L, 0L))
  }

  test("duplicate idx raises; NULL rows drop; NULL group is a stratum") {
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("grp", "i", "x")
    val e = intercept[Exception] {
      SeasonalDecomp.decompose(dup, "grp", "i", "x", 2, 1).collect()
    }
    assert(e.getMessage.contains("duplicate idx"))
    // the guard must survive a remainder-only projection (the
    // q_seasonal_anomaly shape — r10 review fix)
    val e2 = intercept[Exception] {
      SeasonalDecomp.decompose(dup, "grp", "i", "x", 2, 1)
        .select("remainder_q6").collect()
    }
    assert(e2.getMessage.contains("duplicate idx"))
    val df = Seq((Some("a"), Some(1L), Some(4L)), (Some("a"), None, Some(9L)),
      (Some("a"), Some(2L), None), (Option.empty[String], Some(1L), Some(7L)))
      .toDF("grp", "i", "x")
    val got = SeasonalDecomp.decompose(df, "grp", "i", "x", 2, 1).collect()
      .map(r => (Option(r.getString(0)), r.getAs[Long]("idx"))).toSet
    assert(got == Set((Some("a"), 1L), (None, 1L)))
  }
}
