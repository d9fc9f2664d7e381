package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KS distance: hand-checked suprema, identical-distribution zero,
  * disjoint-support one, duplicate-mass collapse, empty-side contract.
  */
class KsDistanceSpec extends SparkSpec {

  import spark.implicits._

  private def ks(a: Seq[Long], b: Seq[Long]) =
    KsDistance.ksDistance(a.map(Tuple1(_)).toDF("v"), b.map(Tuple1(_)).toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("hand-checked supremum at an interior value") {
    // A = {1,2,3,4}, B = {3,4,5,6}: at v=2 F_a=2/4, F_b=0 → dev = 4·2−4·0 = 8
    // ks = 8/16 = 0.5
    assert(ks(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)).toSeq ==
      Seq((4L, 4L, 8L, 500000L)))
  }

  test("identical distributions score zero; disjoint supports score one") {
    assert(ks(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)).head._4 == 0L)
    assert(ks(Seq(1L, 2L), Seq(10L, 20L)).head._4 == 1000000L)
  }

  test("duplicate mass collapses but still counts; sides can differ in size") {
    // A = {5×1000}, B = {2, 3}: at v=5 F_a=1, F_b=0 → dev = 2·1000 = 2000
    // ks = 2000/2000 = 1
    val got = ks(Seq.fill(1000)(5L), Seq(2L, 3L)).head
    assert(got == ((1000L, 2L, 2000L, 1000000L)))
  }

  test("an empty side yields an empty result; NULLs carry no mass") {
    assert(ks(Seq(1L, 2L), Seq.empty).isEmpty)
    val a = Seq(Some(1L), None, Some(2L)).toDF("v")
    val b = Seq(Some(1L), Some(2L)).toDF("v")
    val got = KsDistance.ksDistance(a, b, "v").head()
    assert((got.getLong(0), got.getLong(3)) == ((2L, 0L)))
  }

  test("bucketWidth = 1 is the exact statistic; coarse width == exact KS on pre-bucketed values") {
    val aVals = Seq(-17L, -8L, -7L, -1L, 0L, 3L, 3L, 9L, 14L, 22L)
    val bVals = Seq(-9L, -9L, 2L, 5L, 7L, 7L, 13L, 30L)
    val a = aVals.map(Tuple1(_)).toDF("v"); val b = bVals.map(Tuple1(_)).toDF("v")
    // width 1 ≡ the default path, row for row
    assert(KsDistance.ksDistance(a, b, "v", bucketWidth = 1).collect().toSeq ==
      KsDistance.ksDistance(a, b, "v").collect().toSeq)
    // coarse width ≡ exact KS over floorDiv-pre-bucketed values (negatives
    // must floor toward -inf, not truncate toward zero)
    val w = 5L
    val ab = aVals.map(v => Tuple1(Math.floorDiv(v, w))).toDF("v")
    val bb = bVals.map(v => Tuple1(Math.floorDiv(v, w))).toDF("v")
    assert(KsDistance.ksDistance(a, b, "v", bucketWidth = w).collect().toSeq ==
      KsDistance.ksDistance(ab, bb, "v").collect().toSeq)
    intercept[IllegalArgumentException](KsDistance.ksDistance(a, b, "v", 0))
  }
}
