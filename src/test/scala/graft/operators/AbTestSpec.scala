package graft.operators

import graft.SparkSpec

/** A/B comparison: hand-checked moments, exact mean diff, Welch t sanity,
  * degenerate-arm NULLs, and the partial-agg plan.
  */
class AbTestSpec extends SparkSpec {

  import spark.implicits._

  // control c: 10, 20 (mean 15); treatment t: 20, 40 (mean 30)
  private def d = Seq(("c", 10L), ("c", 20L), ("t", 20L), ("t", 40L))
    .toDF("arm", "v")

  test("armStats: exact n, sums, variance numerator") {
    val s = AbTest.armStats(d, "arm", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).longValueExact(),
          r.getDecimal(4).longValueExact())).toMap
    assert(s("c") === ((2L, 30L, 2L * 500L - 900L))) // n·Σx²−(Σx)² = 1000−900
    assert(s("t") === ((2L, 60L, 2L * 2000L - 3600L)))
  }

  test("compareToControl: exact milli mean diff and a positive t") {
    val r = AbTest.compareToControl(d, "arm", "v", "c")
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(r.length === 1)
    val (arm, nA, nC, diff, t) = r.head
    assert((arm, nA, nC) === (("t", 2L, 2L)))
    assert(diff === 15000L) // mean 30 − mean 15 = 15.000
    // s_t² = 400/2 = 200, s_c² = 100/2 = 50; se² = 200/2 + 50/2 = 125
    assert(t.exists(v => v > 0.0 && math.abs(v - 15.0 / math.sqrt(125.0)) < 1e-12))
  }

  test("negative effects keep exact sign symmetry") {
    val neg = Seq(("c", 30L), ("c", 40L), ("t", 10L), ("t", 20L)).toDF("arm", "v")
    val r = AbTest.compareToControl(neg, "arm", "v", "c")
      .as[(String, Long, Long, Long, Option[Double])].collect().head
    assert(r._4 === -20000L)
    assert(r._5.exists(_ < 0.0))
  }

  test("single-observation arm: integer diff still exact, t NULL") {
    val tiny = Seq(("c", 10L), ("c", 20L), ("t", 33L)).toDF("arm", "v")
    val r = AbTest.compareToControl(tiny, "arm", "v", "c")
      .as[(String, Long, Long, Long, Option[Double])].collect().head
    assert(r._4 === 18000L) // 33 − 15
    assert(r._5.isEmpty)
  }

  test("fractional value column rejected; NULL arms/values excluded") {
    val frac = Seq(("c", 1.5)).toDF("arm", "v")
    intercept[IllegalArgumentException] { AbTest.armStats(frac, "arm", "v") }
    val nulls = Seq((Option("c"), Option(1L)), (Option.empty[String], Option(2L)),
      (Option("c"), Option.empty[Long])).toDF("arm", "v")
    val s = AbTest.armStats(nulls, "arm", "v").collect()
    assert(s.length === 1 && s.head.getLong(1) === 1L)
  }

  test("segmented: per-segment effects, control-less segments drop") {
    val seg = Seq(
      ("mobile", "c", 10L), ("mobile", "c", 20L), ("mobile", "t", 40L), ("mobile", "t", 50L),
      ("web", "c", 100L), ("web", "t", 90L), ("web", "t", 80L),
      ("tv", "t", 7L) // no control arm → dropped
    ).toDF("seg", "arm", "v")
    val r = AbTest.compareToControlBySegment(seg, "seg", "arm", "v", "c")
      .as[(String, String, Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t._5).toMap
    assert(r === Map("mobile" -> 30000L, "web" -> -15000L))
  }

  test("cuped: imbalanced covariate adjusts out, hand-checked θ and diffs") {
    // c: y = x on (10, 20); t: y = x + 5 on (30, 40) — the raw diff (25)
    // is mostly covariate imbalance
    val d = Seq(("c", 10L, 10L), ("c", 20L, 20L), ("t", 30L, 35L), ("t", 40L, 45L))
      .toDF("arm", "x", "y")
    val r = AbTest.cupedCompare(d, "arm", "y", "x", "c")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    // pooled: cov_num = 4·3350 − 100·110 = 2400, var_num = 4·3000 − 10⁴ = 2000
    assert(r === (("t", 2L, 2L, 1200000L, 25000L, 1000L)))
  }

  test("cuped: zero covariate variance yields NULL θ and adjustment") {
    val d = Seq(("c", 7L, 10L), ("c", 7L, 20L), ("t", 7L, 30L)).toDF("arm", "x", "y")
    val r = AbTest.cupedCompare(d, "arm", "y", "x", "c").collect().head
    assert(r.isNullAt(3) && r.isNullAt(5))
    assert(r.getLong(4) === 15000L) // raw diff still exact
  }

  test("sampleRatioCheck: perfect split is zero, deficits and ghosts surface") {
    val even = Seq("a", "a", "b", "b").map(Tuple1(_)).toDF("arm")
    // hand: N=4, W=2, e=2 each, n=2 → contribution 0
    val evMap = AbTest.sampleRatioCheck(even, "arm", Map("a" -> 1L, "b" -> 1L))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(evMap === Map("a" -> 0L, "b" -> 0L))
    // skewed 3:1 against a 1:1 intent: (n·W − N·w)² ·10⁶ / (N·w·W) =
    // (6−4)²·10⁶/8 = 500000 per arm
    val skew = Seq("a", "a", "a", "b").map(Tuple1(_)).toDF("arm")
    val sk = AbTest.sampleRatioCheck(skew, "arm", Map("a" -> 1L, "b" -> 1L))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(sk === Map("a" -> 500000L, "b" -> 500000L))
    // unexpected arm → NULL contribution; weighted-but-absent arm keeps
    // its full deficit
    val ghost = Seq("a", "z").map(Tuple1(_)).toDF("arm")
    val g = AbTest.sampleRatioCheck(ghost, "arm", Map("a" -> 1L, "b" -> 1L))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(3)))).toList
      .sortBy(_._1)
    assert(g.map(_._1) === List("a", "b", "z"))
    assert(g(2)._3.isEmpty) // z: unexpected
    assert(g(1)._2 === 0L && g(1)._3.nonEmpty) // b: absent but expected
  }

  test("sampleRatioFromCounts: NULL-arm store rows are excluded like raw NULLs") {
    val store = Seq((Option("a"), 50L), (Option("b"), 50L), (Option.empty[String], 100L))
      .toDF("arm", "n_obs")
    val r = AbTest.sampleRatioFromCounts(store, Map("a" -> 1L, "b" -> 1L))
      .collect().map(r0 => r0.getString(0) -> r0.getLong(3)).toMap
    assert(r === Map("a" -> 0L, "b" -> 0L)) // perfect split, NULL arm ignored
  }

  test("sampleRatioFromCounts: a maintained count store drives the same check") {
    import graft.operators.IncrementalAgg
    val dir = java.nio.file.Files.createTempDirectory("srm_store").toString
    val batches = Seq(Seq("a", "a", "b"), Seq("a", "b"), Seq("a"))
    batches.foreach { b =>
      IncrementalAgg.update(spark, dir, b.map(Tuple1(_)).toDF("arm"),
        Seq("arm"), Seq(IncrementalAgg.Count("n_obs")))
    }
    val fromStore = AbTest.sampleRatioFromCounts(
        IncrementalAgg.read(spark, dir), Map("a" -> 1L, "b" -> 1L))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val direct = AbTest.sampleRatioCheck(
        batches.flatten.map(Tuple1(_)).toDF("arm"), "arm", Map("a" -> 1L, "b" -> 1L))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(fromStore === direct)
  }

  test("plan: one partial-agg'd shuffle, control broadcast back") {
    val plan = AbTest.compareToControl(d, "arm", "v", "c")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial_count"))
    assert(plan.contains("Broadcast"))
  }
}
