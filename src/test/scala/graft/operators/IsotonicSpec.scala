package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Isotonic PAV: hand block merges, minimax-identity differential,
  * monotone output property, guard raises, codegen pin.
  */
class IsotonicSpec extends SparkSpec {

  import spark.implicits._

  /** O(n³) reference: fit(i) = max_{j≤i} min_{k≥i} quantized avg(j..k)
    * with the same sign-split trunc — the oracle's identity in Scala.
    */
  private def minimax(xs: Seq[Long]): Seq[Long] = {
    val n = xs.length
    val pre = xs.scanLeft(0L)(_ + _)
    def qavg(j: Int, k: Int): Long = {
      val s = (pre(k + 1) - pre(j)) * 1000000L
      val c = (k - j + 1).toLong
      if (s < 0) -((-s) / c) else s / c
    }
    (0 until n).map(i =>
      (0 to i).map(j => (i until n).map(k => qavg(j, k)).min).max)
  }

  test("hand case: single violator merges into a flat pair") {
    // x = 1, 3, 2, 4 -> blocks {1}, {3,2}->avg 2.5, {4}
    val df = Seq(("g", 1L, 1L), ("g", 2L, 3L), ("g", 3L, 2L), ("g", 4L, 4L))
      .toDF("grp", "i", "x")
    val got = Isotonic.fit(df, "grp", "i", "x")
      .orderBy("idx").collect().map(_.getAs[Long]("fit_q6"))
    assert(got.toSeq == Seq(1000000L, 2500000L, 2500000L, 4000000L))
  }

  test("cascading merge: a low tail pulls earlier blocks down") {
    // x = 5, 4, 3 -> one block avg 4
    val df = Seq(("g", 1L, 5L), ("g", 2L, 4L), ("g", 3L, 3L))
      .toDF("grp", "i", "x")
    val got = Isotonic.fit(df, "grp", "i", "x")
      .orderBy("idx").collect().map(_.getAs[Long]("fit_q6"))
    assert(got.toSeq == Seq(4000000L, 4000000L, 4000000L))
  }

  test("already-monotone series is a fixpoint; negatives sign-split") {
    val df = Seq(("g", 1L, -7L), ("g", 2L, -2L), ("g", 3L, 0L), ("g", 4L, 9L))
      .toDF("grp", "i", "x")
    val got = Isotonic.fit(df, "grp", "i", "x")
      .orderBy("idx").collect().map(_.getAs[Long]("fit_q6"))
    assert(got.toSeq == Seq(-7000000L, -2000000L, 0L, 9000000L))
    // truncation toward zero on a negative average: -7, -2 merged would
    // be -4.5 -> -4500000; force it with a violator
    val df2 = Seq(("g", 1L, -2L), ("g", 2L, -7L)).toDF("grp", "i", "x")
    val got2 = Isotonic.fit(df2, "grp", "i", "x")
      .orderBy("idx").collect().map(_.getAs[Long]("fit_q6"))
    assert(got2.toSeq == Seq(-4500000L, -4500000L))
  }

  test("equals the minimax identity on a pseudo-random-ish series; output monotone") {
    // deterministic scrambled series (no RNG): x = (i * 37) % 101
    val xs = (0 until 60).map(i => ((i * 37) % 101).toLong)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("grp", "i", "x")
    val got = Isotonic.fit(df, "grp", "i", "x")
      .orderBy("idx").collect().map(_.getAs[Long]("fit_q6")).toSeq
    assert(got == minimax(xs))
    assert(got.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "isotonic output must be non-decreasing")
  }

  test("groups fit independently; NULL group is a real stratum; NULLs drop") {
    val df = Seq(
      (Some("a"), Some(1L), Some(5L)), (Some("a"), Some(2L), Some(1L)),
      (Some("a"), Some(3L), None), (Some("a"), None, Some(9L)),
      (Option.empty[String], Some(1L), Some(7L)))
      .toDF("grp", "i", "x")
    val got = Isotonic.fit(df, "grp", "i", "x").collect()
      .map(r => (Option(r.getString(0)), r.getAs[Long]("idx"),
        r.getAs[Long]("fit_q6"))).toSet
    assert(got == Set((Some("a"), 1L, 3000000L), (Some("a"), 2L, 3000000L),
      (None, 1L, 7000000L)))
  }

  test("duplicate idx raises; oversized group raises; at-bound passes") {
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("grp", "i", "x")
    val e = intercept[Exception] {
      Isotonic.fit(dup, "grp", "i", "x").collect()
    }
    assert(e.getMessage.contains("duplicate idx"))
    val five = (1L to 5L).map(i => ("g", i, i)).toDF("grp", "i", "x")
    val e2 = intercept[Exception] {
      Isotonic.fit(five, "grp", "i", "x", maxPoints = 4).collect()
    }
    assert(e2.getMessage.contains("exceeds 4 points"))
    assert(Isotonic.fit(five, "grp", "i", "x", maxPoints = 5).count() === 5L)
  }

  test("native expression stays inside whole-stage codegen") {
    import graft.functions.IsotonicPav
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .select(expr(
        "array(named_struct('i', o_orderkey, 'x', CAST(o_custkey AS BIGINT)))")
        .as("arr"))
    val plan = df.select(IsotonicPav(col("arr")).as("f"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
  }
}
