package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** The fused native scorer must be bit-identical to the portable HOF chain
  * it replaces (quantize → zip_with multiply → aggregate sum), including the
  * null semantics, and must stay inside whole-stage codegen.
  */
class QuantizedDotSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() * 2 - 1)), Array.fill(16)((rnd.nextFloat() * 2 - 1)))
    }.toDF("id", "a", "b")
  }

  test("fused expression equals the quantize+HOF chain on random float vectors") {
    val got = vecs.select(
        col("id"),
        QuantizedDot(col("a"), col("b")).as("fused"),
        Similarity.dotQuantized(
          Similarity.quantize(col("a")), Similarity.quantize(col("b"))).as("chain"))
      .collect()
    got.foreach { r => assert(r.getLong(1) === r.getLong(2), s"row ${r.getLong(0)}") }
  }

  test("real embeddings: fused equals chain") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val pairs = emb.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("j"), col("embedding").as("b")))
      .where(col("i") < col("j")).limit(300)
    val bad = pairs.select(
        QuantizedDot(col("a"), col("b")).as("fused"),
        Similarity.dotQuantized(
          Similarity.quantize(col("a")), Similarity.quantize(col("b"))).as("chain"))
      .where(col("fused") =!= col("chain")).count()
    assert(bad === 0L)
  }

  test("null semantics: null element or length mismatch -> NULL, like the chain") {
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, null)),
      (2L, Seq[java.lang.Float](1f, 2f, 3f), Seq[java.lang.Float](1f, 2f)),
      (3L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), QuantizedDot(col("a"), col("b")).as("s"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1))
    assert(got(1).isNullAt(1))
    assert(got(2).getLong(1) ===
      (math.floor(1f * 10000).toLong * math.floor(3f * 10000).toLong +
       math.floor(2f * 10000).toLong * math.floor(4f * 10000).toLong))
  }

  test("double arrays are accepted; non-array input is rejected") {
    val d = Seq((Seq(0.5, -0.25), Seq(1.0, 2.0))).toDF("a", "b")
    val s = d.select(QuantizedDot(col("a"), col("b"))).head().getLong(0)
    assert(s === (5000L * 10000L + (-2500L) * 20000L))
    intercept[Exception] {
      Seq(("x", Seq(1f))).toDF("a", "b").select(QuantizedDot(col("a"), col("b"))).collect()
    }
  }

  test("stays inside whole-stage codegen") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = emb.select(QuantizedDot(col("embedding"), col("embedding")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
  }
}
