package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("two-level prefix sum equals the global running-sum formulation") {
    val docs = (1L to 500L).map(i => (i, ((i * 37) % 90 + 1).toInt)).toDF("id", "ntok")
    val packed = Packing.packAssignments(docs, "id", col("ntok"), ctxLen = 256, bucketSize = 32)
    val direct = docs
      .withColumn("start_offset",
        sum("ntok").over(Window.orderBy("id")).cast("long") - col("ntok"))
      .select(col("id"), col("ntok").cast("long").as("n_tokens"), col("start_offset"),
        expr("start_offset DIV 256").as("chunk_id"))
    assert(packed.orderBy("id").collect().toSeq ===
      direct.orderBy("id").collect().toSeq)
  }

  test("assignment is total and deterministic: every doc in exactly one chunk") {
    val docs = (0L until 200L).map(i => (i, 10 + (i % 5).toInt)).toDF("id", "ntok")
    val a = Packing.packAssignments(docs, "id", col("ntok"), ctxLen = 64, bucketSize = 16)
    assert(a.count() === 200)
    assert(a.select("id").distinct().count() === 200)
    // chunk ids are the contiguous prefix 0..maxChunk (stream has no holes)
    val chunks = a.select("chunk_id").distinct().as[Long].collect().sorted
    assert(chunks === (chunks.head to chunks.last))
    assert(chunks.head === 0L)
  }

  test("chunk token mass and doc spans are consistent with the stream") {
    val docs = (1L to 100L).map(i => (i, 7)).toDF("id", "ntok")
    val stats = Packing.chunkStats(docs, "id", col("ntok"), ctxLen = 70, bucketSize = 8)
      .orderBy("chunk_id").collect()
    // 7 tokens/doc, 70-token chunks ⇒ exactly 10 docs start per chunk
    stats.foreach { r =>
      assert(r.getAs[Long]("n_docs") === 10L)
      assert(r.getAs[Long]("chunk_tokens") === 70L)
    }
    assert(stats.map(_.getAs[Long]("first_doc")).toSeq === (1L to 100L by 10L))
  }

  test("bucket size does not change the layout (pure decomposition knob)") {
    val docs = (1L to 300L).map(i => (i, ((i * 13) % 40 + 1).toInt)).toDF("id", "ntok")
    val a = Packing.packAssignments(docs, "id", col("ntok"), 128, bucketSize = 10)
      .orderBy("id").collect().toSeq
    val b = Packing.packAssignments(docs, "id", col("ntok"), 128, bucketSize = 1000)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }
}
