package graft.operators

import graft.SparkSpec

/** EMD: constant-shift exactness, partial move, identical zero. */
class EmdSpec extends SparkSpec {

  import spark.implicits._

  private def one(a: Seq[Long], b: Seq[Long]) = {
    val da = a.map(v => Tuple1(v)).toDF("v")
    val db = b.map(v => Tuple1(v)).toDF("v")
    KsDistance.emd(da, db, "v").head()
  }

  test("a constant +2 shift costs exactly 2 value units") {
    val r = one(Seq(1L, 2L, 3L), Seq(3L, 4L, 5L))
    assert(r.getAs[String]("emd_num") == "18")
    assert(r.getAs[Long]("emd_q6") == 2000000L)
  }

  test("moving one of two points by 2 costs 1 on average") {
    val r = one(Seq(0L, 10L), Seq(2L, 10L))
    assert(r.getAs[Long]("emd_q6") == 1000000L)
  }

  test("identical distributions cost zero; KS and EMD disagree on shape") {
    assert(one(Seq(1L, 5L), Seq(1L, 5L)).getAs[Long]("emd_q6") == 0L)
    // tiny-shift-everywhere vs big-shift-somewhere: same KS, different EMD
    val small = one(Seq(10L, 20L, 30L), Seq(11L, 21L, 31L))
    val big = one(Seq(10L, 20L, 30L), Seq(11L, 20L, 30L))
    assert(small.getAs[Long]("emd_q6") == 1000000L)
    assert(big.getAs[Long]("emd_q6") == 333333L)
  }
}
