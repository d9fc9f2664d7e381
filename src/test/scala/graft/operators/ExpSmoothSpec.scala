package graft.operators

import graft.SparkSpec

/** Integer EWMA: hand recurrence chains, sign-split truncation,
  * duplicate-idx raise, NULL contracts.
  */
class ExpSmoothSpec extends SparkSpec {

  import spark.implicits._

  test("hand chain at alpha = 1/2") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 15L))
      .toDF("grp", "i", "x")
    val got = ExpSmooth.smooth(df, "grp", "i", "x", 1, 2)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("idx"), r.getAs[Long]("s_q3")))
    // s1 = 10000; s2 = (20000 + 10000) div 2; s3 = (15000 + 15000) div 2
    assert(got.toSeq == Seq((1L, 10000L), (2L, 15000L), (3L, 15000L)))
  }

  test("sign-split truncation at alpha = 1/3") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, -5L), ("g", 3L, 2L))
      .toDF("grp", "i", "x")
    val got = ExpSmooth.smooth(df, "grp", "i", "x", 1, 3)
      .orderBy("idx").collect().map(_.getAs[Long]("s_q3"))
    // s1 = 1000; n2 = -5000 + 2000 = -3000 -> -1000;
    // n3 = 2000 - 2000 = 0 -> 0
    assert(got.toSeq == Seq(1000L, -1000L, 0L))
  }

  test("truncation matches div, not rounding") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L)).toDF("grp", "i", "x")
    val got = ExpSmooth.smooth(df, "grp", "i", "x", 1, 3)
      .orderBy("idx").collect().map(_.getAs[Long]("s_q3"))
    // n2 = 2000 + 2*1000 = 4000 -> 4000 div 3 = 1333 (never 1334)
    assert(got.toSeq == Seq(1000L, 1333L))
  }

  test("duplicate idx within a group raises loudly") {
    val df = Seq(("g", 1L, 10L), ("g", 1L, 20L)).toDF("grp", "i", "x")
    val e = intercept[Exception] {
      ExpSmooth.smooth(df, "grp", "i", "x", 1, 2).collect()
    }
    assert(e.getMessage.contains("duplicate idx"))
  }

  test("oversized group raises loudly; at-bound group folds fine") {
    val df = (1L to 5L).map(i => ("g", i, i * 10L)).toDF("grp", "i", "x")
    val e = intercept[Exception] {
      ExpSmooth.smooth(df, "grp", "i", "x", 1, 2, maxPoints = 4).collect()
    }
    assert(e.getMessage.contains("exceeds 4 points"))
    // exactly at the bound: no raise
    assert(ExpSmooth.smooth(df, "grp", "i", "x", 1, 2, maxPoints = 5)
      .count() === 5L)
  }

  test("NULL idx/value rows drop; NULL group is a real stratum") {
    val df = Seq(
      (Some("a"), Some(1L), Some(4L)), (Some("a"), Some(2L), None),
      (Some("a"), None, Some(9L)), (Option.empty[String], Some(1L), Some(7L)))
      .toDF("grp", "i", "x")
    val got = ExpSmooth.smooth(df, "grp", "i", "x", 1, 2).collect()
      .map(r => (Option(r.getString(0)), r.getAs[Long]("idx"),
        r.getAs[Long]("s_q3")))
    assert(got.toSet == Set((Some("a"), 1L, 4000L), (None, 1L, 7000L)))
  }

  test("alpha outside (0, 1) is rejected") {
    val df = Seq(("g", 1L, 1L)).toDF("grp", "i", "x")
    intercept[IllegalArgumentException] {
      ExpSmooth.smooth(df, "grp", "i", "x", 3, 2)
    }
    intercept[IllegalArgumentException] {
      ExpSmooth.smooth(df, "grp", "i", "x", 0, 2)
    }
  }

  test("Holt-Winters: hand chain at period 2, all rates 1/2") {
    val df = Seq(("g", 1L, 4L), ("g", 2L, 6L), ("g", 3L, 8L), ("g", 4L, 10L))
      .toDF("grp", "i", "x")
    val got = ExpSmooth.holtWinters(df, "grp", "i", "x", period = 2,
        alphaNum = 1, alphaDen = 2, betaNum = 1, betaDen = 2,
        gammaNum = 1, gammaDen = 2)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("idx"), r.getAs[Long]("level_q3"),
        r.getAs[Long]("trend_q3"), r.getAs[Long]("seasonal_q3")))
    assert(got.toSeq == Seq(
      (1L, 4000L, 0L, 0L),
      (2L, 5000L, 500L, 500L),
      (3L, 6750L, 1125L, 625L),
      (4L, 8687L, 1531L, 906L)))
  }

  test("Holt-Winters: first season (len <= period) runs plain Holt on level/trend") {
    val df = Seq(("g", 1L, 7L), ("g", 2L, 3L), ("g", 3L, 11L))
      .toDF("grp", "i", "x")
    val hw = ExpSmooth.holtWinters(df, "grp", "i", "x", period = 5,
        alphaNum = 3, alphaDen = 10, betaNum = 1, betaDen = 10,
        gammaNum = 2, gammaDen = 10)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("level_q3"), r.getAs[Long]("trend_q3")))
    val h = ExpSmooth.holt(df, "grp", "i", "x",
        alphaNum = 3, alphaDen = 10, betaNum = 1, betaDen = 10)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("level_q3"), r.getAs[Long]("trend_q3")))
    assert(hw.toSeq == h.toSeq)
  }

  test("Holt-Winters: dup raises on any column; param guards reject bad period/gamma") {
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("grp", "i", "x")
    val e = intercept[Exception] {
      ExpSmooth.holtWinters(dup, "grp", "i", "x", period = 2,
        alphaNum = 1, alphaDen = 2, betaNum = 1, betaDen = 2,
        gammaNum = 1, gammaDen = 2).select("seasonal_q3").collect()
    }
    assert(e.getMessage.contains("duplicate idx"))
    intercept[IllegalArgumentException] {
      ExpSmooth.holtWinters(dup, "grp", "i", "x", period = 1,
        alphaNum = 1, alphaDen = 2, betaNum = 1, betaDen = 2,
        gammaNum = 1, gammaDen = 2)
    }
    intercept[IllegalArgumentException] {
      ExpSmooth.holtWinters(dup, "grp", "i", "x", period = 2,
        alphaNum = 1, alphaDen = 2, betaNum = 1, betaDen = 2,
        gammaNum = 2, gammaDen = 2)
    }
  }
}
