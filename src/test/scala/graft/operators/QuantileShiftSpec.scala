package graft.operators

import graft.SparkSpec

/** Quantile shift: hand discrete quantiles, a tail-only regression,
  * the parity law at the median, one-sided groups, contracts.
  */
class QuantileShiftSpec extends SparkSpec {

  import spark.implicits._

  private val deciles = Seq((1L, 4L), (1L, 2L), (3L, 4L), (9L, 10L))

  private def table(ref: Seq[Long], cur: Seq[Long]) =
    QuantileShift.shiftTable(ref.map(("g", _)).toDF("grp", "v"),
        cur.map(("g", _)).toDF("grp", "v"), "grp", "v", deciles)
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("hand discrete quantiles on 1..10 (first-crossing rule)") {
    val got = table((1L to 10L).toSeq, (1L to 10L).toSeq)
    // q=1/4 -> smallest v with cum >= 2.5 -> 3; 1/2 -> 5; 3/4 -> 8; 9/10 -> 9
    assert(got((1L, 4L))._1 == 3L)
    assert(got((1L, 2L))._1 == 5L)
    assert(got((3L, 4L))._1 == 8L)
    assert(got((9L, 10L))._1 == 9L)
    assert(got.values.forall(_._3 == 0L)) // identical snapshots: no shift
  }

  test("a tail-only regression moves the P90 and leaves the median") {
    val ref = (1L to 100L).toSeq
    val cur = (1L to 75L) ++ (76L to 100L).map(_ * 10L) // top quartile blows up
    val got = table(ref, cur)
    assert(got((1L, 2L))._3 == 0L)       // median untouched
    assert(got((9L, 10L))._3 > 0L)       // the tail moved
  }

  test("the 1/2 quantile IS the discrete median (parity law)") {
    val got = table(Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L))
    assert(got((1L, 2L))._1 == 2L) // ceil(4/2) = 2nd smallest
  }

  test("groups on one side only publish NULL for the other") {
    val r = QuantileShift.shiftTable(
        Seq(("only_ref", 5L)).toDF("grp", "v"),
        Seq(("only_cur", 7L)).toDF("grp", "v"),
        "grp", "v", Seq((1L, 2L)))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("only_ref").getLong(3) == 5L && r("only_ref").isNullAt(4))
    assert(r("only_cur").isNullAt(3) && r("only_cur").getLong(4) == 7L)
    assert(r.values.forall(_.isNullAt(5)))
  }

  test("quantile contracts: in-range fractions, no duplicates") {
    intercept[IllegalArgumentException] {
      QuantileShift.shiftTable(Seq(("g", 1L)).toDF("grp", "v"),
        Seq(("g", 1L)).toDF("grp", "v"), "grp", "v", Seq((3L, 2L)))
    }
    intercept[IllegalArgumentException] {
      QuantileShift.shiftTable(Seq(("g", 1L)).toDF("grp", "v"),
        Seq(("g", 1L)).toDF("grp", "v"), "grp", "v",
        Seq((1L, 2L), (1L, 2L)))
    }
  }
}
