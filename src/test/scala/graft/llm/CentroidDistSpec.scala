package graft.llm

import graft.SparkSpec

/** Embedding centroid distance: hand integer case, in-group ranking,
  * NULL-group stratum.
  */
class CentroidDistSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: n-scaled distance ranks the outlier last") {
    // codes quantize exactly (maxabs 1): g has x1=(127,0), x2=(0,127),
    // x3=(127,127)… wait maxabs per vector: (1,1) -> (127,127).
    // S = (254, 254), n = 3.
    val df = Seq(
      (1L, "g", Seq(1f, 0f)), (2L, "g", Seq(0f, 1f)), (3L, "g", Seq(1f, 1f)))
      .toDF("vec_id", "grp", "embedding")
    val got = EmbeddingOps.centroidDist2(df, "vec_id", "grp", "embedding")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), BigInt(r.getString(3))))
    // 3x1 - S = (127, -254): 16129 + 64516 = 80645·… exact: 127²+254²
    val d1 = BigInt(127) * 127 + BigInt(254) * 254
    val d3 = BigInt(127) * 127 + BigInt(127) * 127
    assert(got.toSeq == Seq((1L, 3L, d1), (2L, 3L, d1), (3L, 3L, d3)))
    // the symmetric pair ties; the central vector is nearest
    assert(d3 < d1)
  }

  test("separation matrix: hand pair, NULL groups drop from pairs") {
    // g: (127,0) and (127,0) → S=(254,0), n=2; h: (0,127) → S=(0,127), n=1
    // sep² = ‖1·(254,0) − 2·(0,127)‖² = 254² + 254²
    val df = Seq(
      (1L, Some("g"), Seq(1f, 0f)), (2L, Some("g"), Seq(1f, 0f)),
      (3L, Some("h"), Seq(0f, 1f)), (4L, None, Seq(1f, 1f)))
      .toDF("vec_id", "grp", "embedding")
    val got = EmbeddingOps.centroidSeparation(df, "grp", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        BigInt(r.getString(4))))
    assert(got.toSeq == Seq(
      ("g", "h", 2L, 1L, BigInt(254) * 254 * 2)))
  }

  test("a NULL group is a real stratum and scores against its own centroid") {
    val df = Seq(
      (1L, Some("g"), Seq(1f, 0f)), (2L, None, Seq(1f, 0f)),
      (3L, None, Seq(1f, 0f)))
      .toDF("vec_id", "grp", "embedding")
    val got = EmbeddingOps.centroidDist2(df, "vec_id", "grp", "embedding")
      .orderBy("id").collect()
    // both NULL-group rows equal their centroid exactly: distance 0
    assert(got.filter(_.isNullAt(1)).map(r => BigInt(r.getString(3)))
      .forall(_ == 0))
    assert(BigInt(got.head.getString(3)) == 0)
  }
}
