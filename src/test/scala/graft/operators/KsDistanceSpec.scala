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
}
