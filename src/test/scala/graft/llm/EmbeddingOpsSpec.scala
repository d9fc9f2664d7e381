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

  test("quantization is layout-independent on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), EmbeddingOps.quantizeInt8(col("embedding")).as("q"))
        .orderBy("vec_id").collect().toSeq
    assert(run(emb.repartition(1)) === run(emb.repartition(7)))
  }
}
