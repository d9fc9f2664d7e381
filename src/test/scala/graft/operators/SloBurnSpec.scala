package graft.operators

import graft.SparkSpec

class SloBurnSpec extends SparkSpec {
  import spark.implicits._

  test("hand burn: 3 errors in 1000 at a 999/1000 SLO burns 3x exactly") {
    val events = (1 to 1000).map(i => ("svc", 1L, if (i <= 3) 0L else 1L))
    val got = SloBurn.burnRate(events.toDF("k", "b", "ok"), "k", "b", "ok",
      999, 1000).head()
    assert((got.getLong(2), got.getLong(3), got.getLong(4)) ==
      ((1000L, 3L, 3000000L)))
  }

  test("burn 1e6 = exactly on budget; zero errors = zero burn") {
    val onBudget = (1 to 1000).map(i => ("s", 1L, if (i == 1) 0L else 1L))
    assert(SloBurn.burnRate(onBudget.toDF("k", "b", "ok"), "k", "b", "ok",
      999, 1000).head().getLong(4) == 1000000L)
    val clean = Seq(("s", 1L, 1L), ("s", 1L, 1L))
    assert(SloBurn.burnRate(clean.toDF("k", "b", "ok"), "k", "b", "ok",
      999, 1000).head().getLong(4) == 0L)
  }

  test("rolling window sums counts first and honors calendar gaps (range frame)") {
    // buckets 1,2,5: window of 3 at bucket 5 covers ONLY buckets 3..5 -> just 5
    val events = Seq(
      ("s", 1L, 0L), ("s", 1L, 1L),      // b1: 1/2 err
      ("s", 2L, 1L), ("s", 2L, 1L),      // b2: 0/2
      ("s", 5L, 0L), ("s", 5L, 1L))      // b5: 1/2
      .toDF("k", "b", "ok")
    val got = SloBurn.burnRolling(events, "k", "b", "ok", 9, 10, 3)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // budget = 1/10; burn = (err/n)*10
    assert(got == Seq(
      (1L, 2L, 1L, 5000000L),   // 1/2 * 10
      (2L, 4L, 1L, 2500000L),   // buckets 1-2: 1/4 * 10
      (5L, 2L, 1L, 5000000L))) // gap: bucket 5 alone
  }

  test("contracts: non-binary ok raises; slo bounds; NULLs drop; NULL key is a stratum") {
    val bad = Seq(("s", 1L, 2L)).toDF("k", "b", "ok")
    val ex = intercept[Exception](
      SloBurn.burnRate(bad, "k", "b", "ok", 9, 10).collect())
    assert(ex.getMessage.contains("ok must be 0 or 1"))
    intercept[IllegalArgumentException](
      SloBurn.burnRate(bad, "k", "b", "ok", 10, 10))
    val mixed = Seq((Some("s"), Some(1L), Some(1L)),
      (Some("s"), Option.empty[Long], Some(0L)),
      (Option.empty[String], Some(2L), Some(0L))).toDF("k", "b", "ok")
    val got = SloBurn.burnRate(mixed, "k", "b", "ok", 9, 10).collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }
}
