package graft.operators

import graft.SparkSpec

/** Holt double smoothing: hand level/trend chains, sign-split
  * truncation, duplicate guard.
  */
class HoltSpec extends SparkSpec {

  import spark.implicits._

  test("hand chain at alpha = beta = 1/2") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L))
      .toDF("grp", "i", "x")
    val got = ExpSmooth.holt(df, "grp", "i", "x", 1, 2, 1, 2)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("level_q3"), r.getAs[Long]("trend_q3")))
    // l1=10000,b1=0; l2=(20000+10000)/2=15000, b2=(5000+0)/2=2500;
    // l3=(30000+17500)/2=23750, b3=(8750+2500)/2=5625
    assert(got.toSeq == Seq((10000L, 0L), (15000L, 2500L), (23750L, 5625L)))
  }

  test("negative steps sign-split truncate") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, -5L)).toDF("grp", "i", "x")
    val got = ExpSmooth.holt(df, "grp", "i", "x", 1, 3, 1, 2)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("level_q3"), r.getAs[Long]("trend_q3")))
    // l2 = (-5000 + 2*(1000+0)) div 3 = -1000; b2 = (-2000 + 0) div 2 = -1000
    assert(got.toSeq == Seq((1000L, 0L), (-1000L, -1000L)))
  }

  test("oversized group raises loudly, even when only trend is projected") {
    val df = (1L to 5L).map(i => ("g", i, i * 10L)).toDF("grp", "i", "x")
    val e = intercept[Exception] {
      ExpSmooth.holt(df, "grp", "i", "x", 1, 2, 1, 2, maxPoints = 4)
        .select("trend_q3").collect()
    }
    assert(e.getMessage.contains("exceeds 4 points"))
    assert(ExpSmooth.holt(df, "grp", "i", "x", 1, 2, 1, 2, maxPoints = 5)
      .count() === 5L)
  }

  test("duplicate idx raises; beta bounds enforced") {
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("grp", "i", "x")
    val e = intercept[Exception] {
      ExpSmooth.holt(dup, "grp", "i", "x", 1, 2, 1, 2).collect()
    }
    assert(e.getMessage.contains("duplicate idx"))
    // the guard must survive column pruning on EITHER output
    val e2 = intercept[Exception] {
      ExpSmooth.holt(dup, "grp", "i", "x", 1, 2, 1, 2)
        .select("trend_q3").collect()
    }
    assert(e2.getMessage.contains("duplicate idx"))
    intercept[IllegalArgumentException] {
      ExpSmooth.holt(dup, "grp", "i", "x", 1, 2, 2, 2)
    }
  }
}
