package graft.operators

import graft.SparkSpec

/** Share-of-parent: hand shares, mixed-sign semantics, zero-parent NULL,
  * NULL strata.
  */
class ShareOfParentSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked two-level shares") {
    val df = Seq(
      ("A", "a1", 30L), ("A", "a2", 10L), ("B", "b1", 60L))
      .toDF("p", "c", "v")
    val got = ShareOfParent.shares(df, "p", "c", "v")
      .orderBy("parent", "child").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("A", "a1", 30L, 40L, 75000000L, 40000000L),
      ("A", "a2", 10L, 40L, 25000000L, 40000000L),
      ("B", "b1", 60L, 60L, 100000000L, 60000000L)))
  }

  test("mixed signs: a child can exceed its parent; signs combine") {
    // parent A: 50 + (-10) = 40 -> a1 share 125%, a2 share -25%
    val df = Seq(("A", "a1", 50L), ("A", "a2", -10L)).toDF("p", "c", "v")
    val got = ShareOfParent.shares(df, "p", "c", "v")
      .orderBy("child").collect().map(r => (r.getString(1), r.getLong(4)))
    assert(got.toSeq == Seq(("a1", 125000000L), ("a2", -25000000L)))
    // negative parent flips the child's share sign
    val neg = Seq(("N", "n1", -30L), ("N", "n2", 10L)).toDF("p", "c", "v")
    val g2 = ShareOfParent.shares(neg, "p", "c", "v")
      .orderBy("child").collect().map(r => (r.getString(1), r.getLong(4)))
    assert(g2.toSeq == Seq(("n1", 150000000L), ("n2", -50000000L)))
  }

  test("a zero-sum parent yields NULL shares; NULL parent is a stratum") {
    val df = Seq(
      (Some("Z"), "z1", 5L), (Some("Z"), "z2", -5L), (None, "n1", 10L))
      .toDF("p", "c", "v")
    val got = ShareOfParent.shares(df, "p", "c", "v").collect()
    val z = got.filter(r => !r.isNullAt(0) && r.getString(0) == "Z")
    assert(z.forall(_.isNullAt(4)))
    assert(got.exists(r => r.isNullAt(0) && r.getLong(4) == 100000000L))
  }
}
