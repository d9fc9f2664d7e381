package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantile-summary contracts: exactness below the compress threshold,
  * bounded rank error past it (adversarial orders, several
  * partitionings), weight conservation through merges, and the
  * partial-agg plan shape.
  */
class QuantileSketchSpec extends SparkSpec {

  import spark.implicits._

  /** Discrete quantile ground truth: smallest value with cum count ≥ ⌈φn⌉. */
  private def exact(vals: Seq[Long], num: Long, den: Long): Long =
    vals.sorted.apply(((num * vals.length + den - 1) / den - 1).toInt)

  private def sketch(vals: Seq[Long], k: Int, qs: Seq[(Long, Long)],
                     parts: Int): Seq[Long] =
    vals.toDF("v").repartition(parts)
      .agg(Quantiles(k, qs)(col("v")).as("q"))
      .head.getSeq[Long](0)

  test("exact while the group fits the buffer, any partitioning") {
    val vals = scala.util.Random.shuffle((1L to 100L).toList)
    for (parts <- Seq(1, 7, 32)) {
      val got = sketch(vals, k = 64, Seq((1L, 2L), (9L, 10L), (1L, 1L)), parts)
      assert(got == Seq(exact(vals, 1, 2), exact(vals, 9, 10), exact(vals, 1, 1)),
        s"parts=$parts")
    }
  }

  test("bounded rank error past compression on adversarial orders") {
    val n = 50000
    val k = 256
    val asc = (1L to n.toLong).toList
    for ((name, vals) <- Seq("ascending" -> asc, "descending" -> asc.reverse,
        "interleaved" -> asc.grouped(2).toList.reverse.flatten);
        parts <- Seq(1, 32)) {
      val got = sketch(vals, k, Seq((1L, 2L), (9L, 10L)), parts)
      for ((g, (num, den)) <- got.zip(Seq((1L, 2L), (9L, 10L)))) {
        val targetRank = (num * n + den - 1) / den
        // value == rank in this stream, so rank error is directly visible;
        // depth ≈ log2(parts)+reduce compresses; allow 6·n/k
        assert(math.abs(g - targetRank) <= 6L * n / k,
          s"$name parts=$parts $num/$den: got $g want ~$targetRank")
      }
    }
  }

  test("nulls are ignored; all-null group yields empty") {
    val got = Seq[java.lang.Long](1L, null, 3L, null, 2L).toDF("v")
      .agg(Quantiles(8, Seq((1L, 2L)))(col("v")).as("q")).head.getSeq[Long](0)
    assert(got == Seq(2L))
    val empty = Seq[java.lang.Long](null, null).toDF("v")
      .agg(Quantiles(8, Seq((1L, 2L)))(col("v")).as("q")).head.getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("per-group form matches per-group exact computation in exact regime") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("c"))
    val mine = graft.functions.Quantiles.perGroup(df, Seq("o_custkey"), col("c"),
        k = 64, qs = Seq((1L, 2L)), names = Seq("p50"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = df.collect().groupBy(_.getLong(0))
      .map { case (ck, rows) => ck -> exact(rows.map(_.getLong(1)).toSeq, 1, 2) }
    assert(mine == truth)
  }

  test("plan: map-side partial aggregation (summaries merge, rows don't ship)") {
    val plan = (1L to 100L).toDF("v")
      .agg(Quantiles(16, Seq((1L, 2L)))(col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
  }

  test("winsorize: values clip to the group's [p-lo, p-hi], in-range rows untouched") {
    import spark.implicits._
    val df = ((1 to 100).map(("g1", _)) ++ Seq(("g2", 5), ("g2", 50), ("g2", 500)))
      .toDF("g", "v")
    val out = graft.functions.Quantiles.winsorizePerGroup(
        df, Seq("g"), col("v"), k = 64, lo = (1L, 10L), hi = (9L, 10L), outCol = "w")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val g1 = out.filter(_._1 == "g1")
    // exact regime: p10 of 1..100 (disc) = 10, p90 = 90
    assert(g1.forall { case (_, v, w) => w == math.max(10, math.min(90, v)).toLong })
    assert(g1.count { case (_, v, w) => w.toInt == v } === 81)
    // tiny group: disc quantiles are members; bounds clip only the tails
    val g2 = out.filter(_._1 == "g2").map(t => t._2 -> t._3).toMap
    assert(g2(50) === 50L)
    assert(g2(5) >= 5L && g2(500) <= 500L)
  }

  test("invalid k or fractions are rejected") {
    intercept[IllegalArgumentException](new QuantileSketch(1, Seq((1L, 2L))))
    intercept[IllegalArgumentException](new QuantileSketch(8, Seq()))
    intercept[IllegalArgumentException](new QuantileSketch(8, Seq((3L, 2L))))
    intercept[IllegalArgumentException](new QuantileSketch(8, Seq((0L, 2L))))
  }
}
