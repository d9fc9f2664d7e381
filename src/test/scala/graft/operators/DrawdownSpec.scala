package graft.operators

import graft.SparkSpec

/** Max drawdown: hand peak-to-trough, earliest-trough tie election,
  * monotone series, guard raises, NULL contracts.
  */
class DrawdownSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: deepest dip below the running high-water mark") {
    // levels 10, 30, 5, 20, 25: running max 10,30,30,30,30 ->
    // dd 0,0,25,10,5 -> max_dd 25 at t=2; peak 30
    val df = Seq(("g", 0L, 10L), ("g", 1L, 30L), ("g", 2L, 5L),
      ("g", 3L, 20L), ("g", 4L, 25L)).toDF("grp", "t", "v")
    val r = Drawdown.maxDrawdown(df, "grp", "t", "v").collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("peak") == 30L)
    assert(r.getAs[Long]("max_dd") == 25L)
    assert(r.getAs[Long]("trough_idx") == 2L)
  }

  test("tie on max drawdown reports the EARLIEST trough") {
    // 10, 0, 10, 0: dd = 0,10,0,10 — trough_idx must be 1, not 3
    val df = Seq(("g", 0L, 10L), ("g", 1L, 0L), ("g", 2L, 10L),
      ("g", 3L, 0L)).toDF("grp", "t", "v")
    val r = Drawdown.maxDrawdown(df, "grp", "t", "v").collect().head
    assert(r.getAs[Long]("max_dd") == 10L)
    assert(r.getAs[Long]("trough_idx") == 1L)
  }

  test("monotone-rising and single-point series report zero drawdown") {
    val df = Seq(("up", 0L, 1L), ("up", 1L, 2L), ("up", 2L, 3L),
      ("one", 7L, -4L)).toDF("grp", "t", "v")
    val m = Drawdown.maxDrawdown(df, "grp", "t", "v").collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("max_dd"), r.getAs[Long]("trough_idx")))).toMap
    assert(m("up") == ((0L, 0L)))
    assert(m("one") == ((0L, 7L)))
    // negative levels are fine: peak is the (negative) high
    val neg = Seq(("g", 0L, -5L), ("g", 1L, -20L)).toDF("grp", "t", "v")
    val r = Drawdown.maxDrawdown(neg, "grp", "t", "v").collect().head
    assert(r.getAs[Long]("peak") == -5L)
    assert(r.getAs[Long]("max_dd") == 15L)
  }

  test("duplicate idx raises; oversized group raises — on either published column") {
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("grp", "t", "v")
    val e = intercept[Exception] {
      Drawdown.maxDrawdown(dup, "grp", "t", "v").select("max_dd").collect()
    }
    assert(e.getMessage.contains("duplicate idx"))
    val big = (0L until 5L).map(t => ("g", t, t)).toDF("grp", "t", "v")
    val e2 = intercept[Exception] {
      Drawdown.maxDrawdown(big, "grp", "t", "v", maxPoints = 4L)
        .select("trough_idx").collect()
    }
    assert(e2.getMessage.contains("exceeds 4 points"))
    // at the bound passes
    assert(Drawdown.maxDrawdown(big, "grp", "t", "v", maxPoints = 5L)
      .collect().head.getAs[Long]("max_dd") == 0L)
  }

  test("NULL idx/value rows drop; NULL group is a real stratum") {
    val df = Seq((Some("a"), Some(0L), Some(5L)), (Some("a"), None, Some(9L)),
      (Some("a"), Some(1L), None), (Option.empty[String], Some(0L), Some(7L)),
      (Option.empty[String], Some(1L), Some(3L)))
      .toDF("grp", "t", "v")
    val got = Drawdown.maxDrawdown(df, "grp", "t", "v").collect()
      .map(r => Option(r.getString(0)) -> ((r.getAs[Long]("n"), r.getAs[Long]("max_dd")))).toMap
    assert(got(Some("a")) == ((1L, 0L)))
    assert(got(None) == ((2L, 4L)))
  }

  test("non-integral value column raises the Drift-rule guard") {
    val df = Seq(("g", 0L, 1.5)).toDF("grp", "t", "v")
    val e = intercept[IllegalArgumentException] {
      Drawdown.maxDrawdown(df, "grp", "t", "v")
    }
    assert(e.getMessage.contains("integral"))
  }
}
