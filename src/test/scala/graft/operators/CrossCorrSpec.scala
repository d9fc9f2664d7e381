package graft.operators

import graft.SparkSpec

/** Lead-lag: a shifted copy peaks at exactly its shift, pair counts
  * shrink honestly at the edges, gaps contribute no pair.
  */
class CrossCorrSpec extends SparkSpec {

  import spark.implicits._

  // y is x delayed by one step (plus an unrelated first value)
  private def shifted = Seq(
    ("a", 1L, 1L, 9L), ("a", 2L, 2L, 1L), ("a", 3L, 3L, 2L),
    ("a", 4L, 4L, 3L)).toDF("g", "t", "x", "y")

  test("a one-step-delayed copy peaks at lag +1 with corr exactly 1") {
    val got = CrossCorr.leadLag(shifted, "g", "t", "x", "y", maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n"), Option(r.getAs[Double]("corr")))).toMap
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2.get - 1.0) < 1e-12)
    // edge shrink: |lag| = 2 has only 2 pairs
    assert(got(2L)._1 == 2L && got(-2L)._1 == 2L)
    // lag 0 exists with all 4 pairs
    assert(got(0L)._1 == 4L)
  }

  test("gaps contribute no pair; NULL rows drop from the joint series") {
    val df = Seq(
      ("a", Some(1L), Some(1L), Some(10L)),
      ("a", Some(3L), Some(3L), Some(30L)),   // t = 2 missing
      ("a", Some(4L), None, Some(40L)),       // x NULL: row drops entirely
      ("a", None, Some(9L), Some(90L)))
      .toDF("g", "t", "x", "y")
    val got = CrossCorr.leadLag(df, "g", "t", "x", "y", maxLag = 1)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Long]("n")).toMap
    // surviving grid: t = 1, 3 — adjacent at no lag in [-1, 1] except 0
    assert(got(0L) == 2L)
    assert(!got.contains(1L) || got(1L) == 0L)
  }
}
