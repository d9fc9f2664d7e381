package graft.operators

import graft.SparkSpec

/** Adamic–Adar: hand wedge scores, edge exclusion, degree cut. */
class LinkPredictSpec extends SparkSpec {

  import spark.implicits._

  test("path graph: the open wedge scores 1/ln(2)") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = LinkPredict.adamicAdar(e).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Long]("cn"), r.getAs[Long]("aa_q6")))
    assert(got.toSeq == Seq((1L, 3L, 1L, 1442695L)))
  }

  test("square graph: both diagonals via two centers") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = LinkPredict.adamicAdar(e).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Long]("cn"), r.getAs[Long]("aa_q6"))).toSet
    assert(got == Set((1L, 3L, 2L, 2885390L), (2L, 4L, 2L, 2885390L)))
  }

  test("closed triangle yields no candidates (existing edges excluded)") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(LinkPredict.adamicAdar(e).count() == 0L)
  }

  test("hub centers above maxDeg are cut; below they score 1/ln(3)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    assert(LinkPredict.adamicAdar(star, maxDeg = 2).count() == 0L)
    val got = LinkPredict.adamicAdar(star, maxDeg = 3).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Long]("aa_q6"))).toSet
    assert(got == Set((1L, 2L, 910239L), (1L, 3L, 910239L),
      (2L, 3L, 910239L)))
  }

  test("minCommon filters single-wedge pairs; dirty edges canonicalize") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 3L)).toDF("src", "dst")
    assert(LinkPredict.adamicAdar(e, minCommon = 2).count() == 0L)
    val got = LinkPredict.adamicAdar(e).collect()
    assert(got.length == 1 && got.head.getAs[Long]("cn") == 1L)
  }
}
