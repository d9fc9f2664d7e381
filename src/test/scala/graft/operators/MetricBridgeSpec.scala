package graft.operators

import graft.SparkSpec

/** Mix-rate bridge: hand decomposition summing to the metric delta,
  * enter/exit conventions, guards.
  */
class MetricBridgeSpec extends SparkSpec {

  import spark.implicits._

  test("hand decomposition: contributions sum to the metric delta") {
    // A: x (10/2), y (3/1); B: x (6/1), y (9/3)
    val df = Seq(("A", "x", 10L, 2L), ("A", "y", 3L, 1L),
      ("B", "x", 6L, 1L), ("B", "y", 9L, 3L))
      .toDF("p", "seg", "num", "den")
    val got = MetricBridge.mixRateBridge(df, "p", "seg", "num", "den",
        "A", "B")
      .orderBy("seg").collect()
      .map(r => (r.getString(0), r.getAs[Long]("mix_q6"),
        r.getAs[Long]("rate_q6"), r.getAs[Long]("contrib_q6")))
    // x: mix -25/12, rate 1/4; y: mix 5/4, rate 0
    assert(got.toSeq == Seq(
      ("x", -2083333L, 250000L, -1833333L),
      ("y", 1250000L, 0L, 1250000L)))
    // Sigma contrib ~ delta M = -7/12 = -583333 (one floor unit of slack)
    val s = got.map(_._4).sum
    assert(math.abs(s - -583333L) <= 2L, s"sum=$s")
  }

  test("entering segments are all mix; exiting collapse to -n1/D1") {
    val df = Seq(("A", "w", 4L, 2L), ("A", "x", 4L, 2L),
      ("B", "x", 4L, 2L), ("B", "z", 6L, 2L))
      .toDF("p", "seg", "num", "den")
    val got = MetricBridge.mixRateBridge(df, "p", "seg", "num", "den",
        "A", "B")
      .orderBy("seg").collect()
      .map(r => (r.getString(0), r.getAs[Long]("mix_q6"),
        r.getAs[Long]("rate_q6")))
    // D_A = D_B = 4: w exits: mix = -4/4 = -1.0; z enters: mix = 6/4
    assert(got.toSeq == Seq(("w", -1000000L, 0L),
      ("x", 0L, 0L), ("z", 1500000L, 0L)))
  }

  test("empty periods and negative denominators raise") {
    val onlyA = Seq(("A", "x", 1L, 1L)).toDF("p", "seg", "num", "den")
    intercept[Exception] {
      MetricBridge.mixRateBridge(onlyA, "p", "seg", "num", "den",
        "A", "B").collect()
    }
    val neg = Seq(("A", "x", 1L, -1L), ("B", "x", 1L, 1L))
      .toDF("p", "seg", "num", "den")
    val e = intercept[Exception] {
      MetricBridge.mixRateBridge(neg, "p", "seg", "num", "den",
        "A", "B").collect()
    }
    assert(e.getMessage.contains("negative denominator"))
  }
}
