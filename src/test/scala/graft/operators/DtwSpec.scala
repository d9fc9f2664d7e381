package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DTW: hand DP, brute-force differential, shift-tolerance vs Euclidean,
  * band semantics, guards, codegen pin.
  */
class DtwSpec extends SparkSpec {

  import spark.implicits._

  private def bruteDtw(a: Seq[Long], b: Seq[Long]): Long = {
    val Inf = Long.MaxValue / 4
    var prev = 0L +: Seq.fill(b.length)(Inf)
    for (i <- 1 to a.length) {
      val cur = Array.fill(b.length + 1)(Inf)
      for (j <- 1 to b.length) {
        val best = Seq(prev(j), prev(j - 1), cur(j - 1)).min
        if (best < Inf) cur(j) = best + math.abs(a(i - 1) - b(j - 1))
      }
      prev = cur.toSeq
    }
    prev(b.length)
  }

  private def series(m: Map[String, Seq[Long]]) =
    m.toSeq.flatMap { case (g, xs) =>
      xs.zipWithIndex.map { case (x, i) => (g, i.toLong, x) }
    }.toDF("g", "i", "x")

  test("hand case: classic 3x2 alignment costs 3") {
    val df = series(Map("A" -> Seq(0L, 3L, 5L), "B" -> Seq(1L, 5L)))
    val r = Dtw.pairwiseMatrix(df, "g", "i", "x").collect().head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("dtw") == 3L)
  }

  test("differential: full DP equals brute force over deterministic series") {
    val m = Map(
      "p" -> (1L to 30L).map(i => (i * 7) % 23),
      "q" -> (1L to 25L).map(i => (i * 11) % 19),
      "r" -> (1L to 40L).map(i => (i * 3) % 31))
    val got = Dtw.pairwiseMatrix(series(m), "g", "i", "x").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("dtw")).toMap
    for (Seq(a, b) <- m.keys.toSeq.sorted.combinations(2))
      assert(got((a, b)) == bruteDtw(m(a), m(b)), s"$a-$b")
  }

  test("shift tolerance: a lagged copy is DTW-near but Euclidean-far") {
    val base = (1L to 20L).map(i => (i * 13) % 37)
    val lagged = 0L +: base.dropRight(1)
    val df = series(Map("orig" -> base, "lag" -> lagged))
    val dtw = Dtw.pairwiseMatrix(df, "g", "i", "x").collect().head.getAs[Long]("dtw")
    val euclid = base.zip(lagged).map { case (a, b) => math.abs(a - b) }.sum
    assert(dtw < euclid / 4, s"dtw=$dtw euclid=$euclid")
  }

  test("band: wide band equals full DP; tight band can only raise the cost; band >= |n-m| enforced") {
    val m = Map("p" -> (1L to 30L).map(i => (i * 7) % 23),
      "q" -> (1L to 22L).map(i => (i * 5) % 17))
    val full = Dtw.pairwiseMatrix(series(m), "g", "i", "x")
      .collect().head.getAs[Long]("dtw")
    val wide = Dtw.pairwiseMatrix(series(m), "g", "i", "x", band = 100)
      .collect().head.getAs[Long]("dtw")
    assert(wide == full)
    // band 1 is widened to |30-22| = 8 internally, still feasible
    val tight = Dtw.pairwiseMatrix(series(m), "g", "i", "x", band = 1)
      .collect().head.getAs[Long]("dtw")
    assert(tight >= full)
  }

  test("guards: duplicate idx raises; oversized group raises before the quadratic DP") {
    val dup = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("b", 1L, 3L)).toDF("g", "i", "x")
    val e = intercept[Exception] {
      Dtw.pairwiseMatrix(dup, "g", "i", "x").collect()
    }
    assert(e.getMessage.contains("duplicate idx"))
    val big = series(Map("a" -> (1L to 9L), "b" -> (1L to 3L)))
    val e2 = intercept[Exception] {
      Dtw.pairwiseMatrix(big, "g", "i", "x", maxPoints = 8L).collect()
    }
    assert(e2.getMessage.contains("quadratic"))
  }

  test("codegen: the DP expression stays inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = docs.select(graft.functions.DtwCost(
      array(col("n_chars"), col("n_chars") + 2),
      array(col("n_chars") + 1), 0).as("d"))
    assert(out.limit(1).collect().head.getLong(0) == 2L) // |0-1| + |2-1|
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
  }
}
