package graft.operators

import graft.SparkSpec

class WinsorizedMeanSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[Long], k: Int) =
    TrimmedMean.winsorizedMean(vals.map(("g", _)).toDF("g", "v"), "g", "v", k)
      .head()

  test("hand clamp: 1..10 at k=2 pins both tails to the 3rd order statistics") {
    val got = run(1L to 10L, 2)
    // clamped: 3,3,3,4,5,6,7,8,8,8 -> sum 55, mean 5.5
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((10L, 55L, 5500000L)))
  }

  test("matches a sorted-reference clamp on mixed-sign multisets across partitionings") {
    val vals = Seq(-40L, -40L, -7L, 0L, 0L, 3L, 3L, 3L, 12L, 90L, 90L, 1000L)
    for (k <- Seq(1, 2, 3, 4)) {
      val sorted = vals.sorted
      val lob = sorted(k); val hib = sorted(vals.size - 1 - k)
      val expect = sorted.map(v => math.max(lob, math.min(hib, v))).sum
      val df13 = vals.map(("g", _)).toDF("g", "v").repartition(13)
      val got = TrimmedMean.winsorizedMean(df13, "g", "v", k).head()
      assert(got.getLong(2) == expect, s"k=$k")
    }
  }

  test("boundary ties clamp to themselves; n <= 2k publishes NULL") {
    val tied = Seq(5L, 5L, 5L, 5L, 5L)
    assert(run(tied, 2).getLong(2) == 25L)
    val small = run(Seq(1L, 2L, 3L, 4L), 2)
    assert(small.isNullAt(2) && small.isNullAt(3))
    intercept[IllegalArgumentException](run(Seq(1L), 0))
  }
}
