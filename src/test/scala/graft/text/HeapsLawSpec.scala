package graft.text

import graft.SparkSpec

/** Heaps' law: hand first-occurrence positions, the all-unique β=1
  * anchor, vocab-of-1 NULL, cross-doc position offsets.
  */
class HeapsLawSpec extends SparkSpec {

  import spark.implicits._

  private def expected(pts: Seq[(Long, Long)]): Long = {
    val n = BigInt(pts.size)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    (num.sign * ((num.abs * 10000) / den)).toLong
  }

  private def ln6(x: Long): Long =
    math.floor(1e6 * math.log(x.toDouble)).toLong

  test("hand debut positions across docs (offsets applied)") {
    // doc1 "a b a" (a@1, b@2), doc2 "c a" (c@4): debuts (1,1),(2,2),(4,3)
    val df = Seq(("g", 1L, "a b a"), ("g", 2L, "c a"))
      .toDF("grp", "id", "text")
    val r = ZipfLaw.vocabularyGrowthSlope(df, "grp", "id", "text").head()
    assert(r.getAs[Long]("n") == 3L)
    val want = expected(Seq((ln6(1), ln6(1)), (ln6(2), ln6(2)),
      (ln6(4), ln6(3))))
    assert(r.getAs[Long]("slope_q") == want)
  }

  test("all-unique tokens grow at exactly beta = 1") {
    val df = Seq(("g", 1L, "a b c d e")).toDF("grp", "id", "text")
    val r = ZipfLaw.vocabularyGrowthSlope(df, "grp", "id", "text").head()
    assert(r.getAs[Long]("slope_q") == 10000L)
  }

  test("a one-token vocabulary reports NULL (no growth axis)") {
    val df = Seq(("g", 1L, "a a a a")).toDF("grp", "id", "text")
    val r = ZipfLaw.vocabularyGrowthSlope(df, "grp", "id", "text").head()
    assert(r.isNullAt(r.fieldIndex("slope_q")))
  }
}
