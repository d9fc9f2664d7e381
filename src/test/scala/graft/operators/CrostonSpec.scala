package graft.operators

import graft.SparkSpec

/** Croston: hand-folded states, zero filtering, sparse-gap semantics,
  * constant-demand fixpoint, all four raises, NULL strata.
  */
class CrostonSpec extends SparkSpec {

  import spark.implicits._

  test("hand-folded two-state recurrence at alpha = 1/2") {
    // demands at i=2 (x=4), i=5 (x=8), i=6 (x=2); start 0
    val df = Seq(("g", 2L, 4L), ("g", 5L, 8L), ("g", 6L, 2L))
      .toDF("grp", "i", "x")
    val got = Croston.method(df, "grp", "i", "x", 1, 2, startIdx = 0L)
      .orderBy("idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // t1: g=2, z=4000, p=2000
    // t2: g=3, z=(8000+4000)/2=6000, p=(3000+2000)/2=2500
    // t3: g=1, z=(2000+6000)/2=4000, p=(1000+2500)/2=1750
    assert(got.toSeq == Seq((2L, 2L, 4000L, 2000L),
      (5L, 3L, 6000L, 2500L), (6L, 1L, 4000L, 1750L)))
  }

  test("zero-demand rows are filtered, not folded") {
    val sparse = Seq(("g", 2L, 4L), ("g", 5L, 8L)).toDF("grp", "i", "x")
    val dense = Seq(("g", 1L, 0L), ("g", 2L, 4L), ("g", 3L, 0L),
      ("g", 4L, 0L), ("g", 5L, 8L)).toDF("grp", "i", "x")
    val a = Croston.method(sparse, "grp", "i", "x", 1, 2, 0L).collect().toSeq
    val b = Croston.method(dense, "grp", "i", "x", 1, 2, 0L).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("constant demand at constant cadence is a fixpoint") {
    val df = (1 to 8).map(t => ("g", t * 3L, 6L)).toDF("grp", "i", "x")
    val got = Croston.method(df, "grp", "i", "x", 1, 4, startIdx = 0L)
      .collect()
    assert(got.forall(r => r.getLong(3) == 6000L && r.getLong(4) == 3000L))
  }

  test("truncation is sign-split (all quantities here non-negative)") {
    // alpha=1/3: z2 = (1*5000 + 2*7000)/3 = 19000/3 -> 6333 (trunc)
    val df = Seq(("g", 1L, 7L), ("g", 2L, 5L)).toDF("grp", "i", "x")
    val r = Croston.method(df, "grp", "i", "x", 1, 3, 0L)
      .orderBy("idx").collect()(1)
    assert(r.getLong(3) == 6333L)
  }

  test("negative demand, idx at/below startIdx, duplicates, whale groups raise") {
    val neg = Seq(("g", 1L, -2L)).toDF("grp", "i", "x")
    val e1 = intercept[Exception] {
      Croston.method(neg, "grp", "i", "x", 1, 2, 0L).collect() }
    assert(e1.getMessage.contains("negative demand"))
    val low = Seq(("g", 0L, 2L)).toDF("grp", "i", "x")
    val e2 = intercept[Exception] {
      Croston.method(low, "grp", "i", "x", 1, 2, 0L).collect() }
    assert(e2.getMessage.contains("must exceed startIdx"))
    val dup = Seq(("g", 1L, 2L), ("g", 1L, 3L)).toDF("grp", "i", "x")
    val e3 = intercept[Exception] {
      Croston.method(dup, "grp", "i", "x", 1, 2, 0L).collect() }
    assert(e3.getMessage.contains("duplicate idx"))
    val big = (1 to 5).map(i => ("g", i.toLong, 1L)).toDF("grp", "i", "x")
    val e4 = intercept[Exception] {
      Croston.method(big, "grp", "i", "x", 1, 2, 0L, maxPoints = 4L)
        .collect() }
    assert(e4.getMessage.contains("exceeds 4"))
  }

  test("NULL groups are real strata; NULL idx/value rows drop") {
    val df = Seq((Some("g"), Some(1L), Some(2L)), (None, Some(1L), Some(3L)),
      (Some("g"), None, Some(4L)), (Some("g"), Some(9L), None))
      .toDF("grp", "i", "x")
    val got = Croston.method(df, "grp", "i", "x", 1, 2, 0L).collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }
}
