package graft.operators

import graft.SparkSpec

/** Binary segmentation: exact D on a tiny series, one-step and
  * two-step recovery, the evidence bar, edge guards, dup raise.
  */
class BinarySegSpec extends SparkSpec {

  import spark.implicits._

  private def series(vs: Seq[Long], minSize: Int = 3, minDev: Long = 1L,
                     depth: Int = 3) = {
    val df = vs.zipWithIndex.map { case (v, i) => ("g", i.toLong + 1, v) }
      .toDF("grp", "i", "x")
    BinarySeg.changePoints(df, "grp", "i", "x", minSize, minDev, depth)
      .orderBy("depth", "split_pos").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
  }

  test("exact D statistic on a three-point series") {
    // x = 0,0,9: D_1 = |3*0-1*9| = 9, D_2 = |3*0-2*9| = 18 -> pos 2
    val got = series(Seq(0L, 0L, 9L), minSize = 1, minDev = 1L, depth = 1)
    assert(got == Seq((2L, 18L, 1L)))
  }

  test("a single step splits once; flat halves stop the recursion") {
    val vs = Seq.fill(10)(0L) ++ Seq.fill(10)(100L)
    val got = series(vs, minSize = 3, minDev = 100L, depth = 3)
    assert(got == Seq((10L, 10L * 10L * 100L, 1L)))
  }

  test("two level shifts recover across depths") {
    val vs = Seq.fill(10)(0L) ++ Seq.fill(10)(100L) ++ Seq.fill(10)(50L)
    val got = series(vs, minSize = 3, minDev = 1000L, depth = 3)
    assert(got.length == 2)
    val positions = got.map(_._1).toSet
    assert(positions == Set(10L, 20L))
    assert(got.head._3 == 1L && got.last._3 == 2L)
  }

  test("the evidence bar suppresses splits on a flat-enough series") {
    val vs = Seq(5L, 6L, 5L, 6L, 5L, 6L, 5L, 6L)
    assert(series(vs, minSize = 2, minDev = 100L).isEmpty)
  }

  test("splits respect the minSize edge guard") {
    // the best unguarded split would be at pos 1 (single outlier first)
    val vs = Seq(100L) ++ Seq.fill(9)(0L)
    val got = series(vs, minSize = 3, minDev = 1L, depth = 1)
    assert(got.forall(s => s._1 >= 3L && s._1 <= 7L))
  }

  test("duplicate idx raises in-plan") {
    val df = Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 2L, 3L))
      .toDF("grp", "i", "x")
    val e = intercept[Exception] {
      BinarySeg.changePoints(df, "grp", "i", "x", 1, 1L, 1).collect()
    }
    assert(e.getMessage.contains("duplicate idx"))
  }

  test("a NULL group is a real stratum with its own splits (r10 fix)") {
    val vs = (Seq.fill(6)(0L) ++ Seq.fill(6)(100L)).zipWithIndex
      .map { case (v, i) => (None: Option[String], i.toLong + 1, v) }
    val df = vs.toDF("grp", "i", "x")
    val got = BinarySeg.changePoints(df, "grp", "i", "x", 3, 100L, 2)
      .collect()
    assert(got.length == 1 && got.head.isNullAt(0))
    assert(got.head.getLong(1) == 6L)
  }
}
