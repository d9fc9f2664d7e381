package graft.operators

import graft.SparkSpec

/** Chapman estimator: textbook hand case, duplicate-capture collapse,
  * zero overlap, grouped strata, NULL drops.
  */
class CaptureRecaptureSpec extends SparkSpec {

  import spark.implicits._

  test("textbook hand case: n1=10, n2=8, m=4 estimates 18 (floor of 19.8-1)") {
    val a = (1L to 10L).toDF("k")
    val b = ((7L to 10L) ++ (21L to 24L)).toDF("k") // 4 overlap, 4 new
    val r = CaptureRecapture.chapman(a, b, "k").collect().head
    assert(r.getAs[Long]("n1") == 10L)
    assert(r.getAs[Long]("n2") == 8L)
    assert(r.getAs[Long]("overlap") == 4L)
    // (11*9) div 5 - 1 = 19 - 1 = 18
    assert(r.getAs[Long]("nhat") == 18L)
    // 11*9*6*4 div (25*6) = 2376 div 150 = 15
    assert(r.getAs[Long]("var_floor") == 15L)
  }

  test("recapturing the same key twice counts once; NULL keys drop") {
    val a = Seq(Some(1L), Some(1L), Some(2L), None).toDF("k")
    val b = Seq(Some(2L), Some(2L), Some(3L)).toDF("k")
    val r = CaptureRecapture.chapman(a, b, "k").collect().head
    assert(r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("overlap") == 1L)
  }

  test("zero overlap stays defined (the Chapman correction)") {
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(3L, 4L).toDF("k")
    val r = CaptureRecapture.chapman(a, b, "k").collect().head
    // (3*3) div 1 - 1 = 8
    assert(r.getAs[Long]("nhat") == 8L)
  }

  test("grouped strata estimate independently") {
    val a = Seq(("x", 1L), ("x", 2L), ("y", 1L)).toDF("g", "k")
    val b = Seq(("x", 2L), ("x", 3L), ("y", 9L)).toDF("g", "k")
    val m = CaptureRecapture.chapman(a, b, "k", Seq("g")).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("overlap"), r.getAs[Long]("nhat")))).toMap
    // x: n1=2 n2=2 m=1 -> 9 div 2 - 1 = 3; y: m=0 -> 4 div 1 - 1 = 3
    assert(m("x") == ((1L, 3L)))
    assert(m("y") == ((0L, 3L)))
  }
}
