package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, -2.0f, 0.5f, 4.0f)),
    (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
    (3L, Seq(-3.0f, 3.0f, 1.5f, -0.25f))
  ).toDF("id", "v")

  test("codes are bounded to [-127, 127] and the max-|x| element hits ±127") {
    val rows = vecs.select(col("id"), EmbeddingOps.quantizeInt8(col("v")).as("q"))
      .orderBy("id").as[(Long, Seq[Int])].collect()
    rows.foreach { case (_, q) => q.foreach(c => assert(c.abs <= 127)) }
    assert(rows(0)._2(3) === 127)  // 4.0 is the range of vec 1
    assert(rows(2)._2(0) === -127) // -3.0 ties the range of vec 3
    assert(rows(1)._2 === Seq(0, 0, 0, 0)) // zero vector → zero codes
  }

  test("dequantization error is bounded by m/254 per element") {
    val out = vecs.where(col("id") =!= 2)
      .select(col("v"), EmbeddingOps.quantizeInt8(col("v")).as("q"),
        EmbeddingOps.maxAbs(col("v")).as("m"))
      .as[(Seq[Float], Seq[Int], Double)].collect()
    out.foreach { case (v, q, m) =>
      val deq = q.map(_ * m / 127.0)
      v.zip(deq).foreach { case (x, xh) =>
        assert(math.abs(x - xh) <= m / 254.0 + 1e-12, s"$x vs $xh (m=$m)")
      }
    }
  }

  test("l2Normalize yields unit norm; zero vector stays zero") {
    val out = vecs.select(col("id"), EmbeddingOps.l2Normalize(col("v")).as("n"))
      .orderBy("id").as[(Long, Seq[Double])].collect()
    assert(math.abs(out(0)._2.map(x => x * x).sum - 1.0) < 1e-12)
    assert(out(1)._2 === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("int8Knn ranks within the quantized space exactly (brute-force check)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val got = EmbeddingOps.int8Knn(emb, emb.where(col("vec_id") < 3), k = 5)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // reference: quantize locally and score in plain Scala
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def q(v: Seq[Float]): Seq[Long] = {
      val m = v.map(x => math.abs(x.toDouble)).max
      if (m == 0) v.map(_ => 0L)
      else v.map(x => math.floor(x.toDouble * (127.0 / m) + 0.5).toLong)
    }
    val codes = vecs.map { case (id, v) => id -> q(v) }.toMap
    val expect = vecs.filter(_._1 < 3).flatMap { case (qid, _) =>
      vecs.filter(_._1 != qid)
        .map { case (nid, _) => (nid, codes(qid).zip(codes(nid)).map { case (a, b) => a * b }.sum) }
        .sortBy { case (nid, s) => (-s, nid) }.take(5)
        .map { case (nid, _) => (qid, nid) }
    }
    assert(got.toSeq === expect.toSeq)
  }

  test("quantization is layout-independent on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), EmbeddingOps.quantizeInt8(col("embedding")).as("q"))
        .orderBy("vec_id").collect().toSeq
    assert(run(emb.repartition(1)) === run(emb.repartition(7)))
  }

  test("centroidSums: exact per-dim sums; cosine of sums matches hand math") {
    import spark.implicits._
    val a = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val b = Seq((3L, Array(0.0f, 1.0f)), (4L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val sums = EmbeddingOps.centroidSums(a, b, "embedding")
    val got = sums.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a-vectors quantize to (127, 0) each -> sums (254, 0)
    // b: (0,127) and (127,127) -> sums (127, 254)
    assert(got == Map(0L -> ((254L, 127L)), 1L -> ((0L, 254L))))
    val cos = EmbeddingOps.centroidCosine(sums).get
    val expect = (254.0 * 127.0 + 0.0) /
      (math.sqrt(254.0 * 254.0) * math.sqrt(127.0 * 127.0 + 254.0 * 254.0))
    assert(math.abs(cos - expect) < 1e-12)
  }

  test("centroidCosine is None when a side is all zero") {
    import spark.implicits._
    val a = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val b = Seq((2L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(EmbeddingOps.centroidCosine(
      EmbeddingOps.centroidSums(a, b, "embedding")).isEmpty)
  }
}
