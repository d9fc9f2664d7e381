package graft.operators

import graft.SparkSpec

/** 2×2 suite: hand cells and exact fractions, zero-cell flag, the MH
  * per-term-floored pooling, a Simpson's-reversal guard case, the 0/1
  * contract raise, NULL strata.
  */
class EpiSpec extends SparkSpec {

  import spark.implicits._

  private def rows(spec: (String, Int, Int, Int)*): org.apache.spark.sql.DataFrame =
    spec.flatMap { case (g, e, o, n) => Seq.fill(n)((g, e.toLong, o.toLong)) }
      .toDF("grp", "e", "o")

  test("hand cells: exact odds-ratio and relative-risk fractions") {
    val df = rows(("g", 1, 1, 2), ("g", 1, 0, 1), ("g", 0, 1, 1), ("g", 0, 0, 2))
    val r = Epi.twoByTwo(df, "grp", "e", "o").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 1L, 1L, 2L)))
    assert(r.getLong(5) == 4L && r.getLong(6) == 1L) // OR = 4/1
    assert(r.getLong(7) == 6L && r.getLong(8) == 3L) // RR = 6/3 = 2
    assert(!r.getBoolean(9))
  }

  test("zero cells flag rather than silently correcting") {
    val df = rows(("g", 1, 1, 3), ("g", 0, 1, 1), ("g", 0, 0, 2))
    val r = Epi.twoByTwo(df, "grp", "e", "o").head()
    assert(r.getLong(2) == 0L && r.getBoolean(9))
    assert(r.getLong(6) == 0L) // degenerate denominator published as-is
  }

  test("Mantel-Haenszel pools per-term-floored q6 sums") {
    // stratum 1: a=2,b=1,c=1,d=2,n=6: ad/n=4/6 -> 666666; bc/n=1/6 -> 166666
    // stratum 2: a=1,b=1,c=1,d=1,n=4: 250000; 250000
    val df = rows(("s1", 1, 1, 2), ("s1", 1, 0, 1), ("s1", 0, 1, 1),
      ("s1", 0, 0, 2), ("s2", 1, 1, 1), ("s2", 1, 0, 1), ("s2", 0, 1, 1),
      ("s2", 0, 0, 1))
    val r = Epi.mantelHaenszel(df, "grp", "e", "o").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 10L)
    assert(r.getLong(2) == 666666L + 250000L)
    assert(r.getLong(3) == 166666L + 250000L)
  }

  test("MH resists the naive pooled table (Simpson guard)") {
    // two strata each with OR = 1 exactly, but very different exposure
    // rates: the naive pooled 2x2 shows a spurious association, MH = 1
    val df = rows(
      ("s1", 1, 1, 90), ("s1", 1, 0, 10), ("s1", 0, 1, 9), ("s1", 0, 0, 1),
      ("s2", 1, 1, 1), ("s2", 1, 0, 9), ("s2", 0, 1, 10), ("s2", 0, 0, 90))
    val mh = Epi.mantelHaenszel(df, "grp", "e", "o").head()
    assert(mh.getLong(2) == mh.getLong(3)) // pooled OR exactly 1
    val naive = Epi.twoByTwo(df.withColumn("grp",
      org.apache.spark.sql.functions.lit("all")), "grp", "e", "o").head()
    assert(naive.getLong(5) != naive.getLong(6)) // the trap MH avoids
  }

  test("non-0/1 exposure or outcome raises in-plan") {
    val df = Seq(("g", 2L, 1L)).toDF("grp", "e", "o")
    val ex = intercept[Exception] {
      Epi.twoByTwo(df, "grp", "e", "o").collect()
    }
    assert(ex.getMessage.contains("must be 0/1"))
  }

  test("NULL strata are real; NULL exposure/outcome rows drop") {
    val df = Seq((Some("g"), Some(1L), Some(1L)), (None, Some(0L), Some(1L)),
      (Some("g"), None, Some(1L)), (Some("g"), Some(1L), None))
      .toDF("grp", "e", "o")
    val got = Epi.twoByTwo(df, "grp", "e", "o").collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }
}
