package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.col
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

  test("chunkDocs: overlap, truncation, and full coverage") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val got = Packing.chunkDocs(docs, "id", "text", chunkTokens = 4, stride = 3)
      .orderBy("chunk_id")
      .select("chunk_id", "start_token", "n_tokens", "chunk_text").collect()
    // starts 1,4,7,10 → chunks of 4,4,4,1 tokens
    assert(got.map(_.getLong(1)).toSeq === Seq(1L, 4L, 7L, 10L))
    assert(got.map(_.getLong(2)).toSeq === Seq(4L, 4L, 4L, 1L))
    assert(got(0).getString(3) === "t1 t2 t3 t4")
    assert(got(1).getString(3) === "t4 t5 t6 t7") // 1-token overlap
    assert(got(3).getString(3) === "t10")
    // every token is covered by at least one chunk
    val covered = got.flatMap(r => r.getString(3).split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"t$i").toSet)
  }

  test("chunkDocs: short doc yields exactly one chunk") {
    val docs = Seq((1L, "just three tokens")).toDF("id", "text")
    val got = Packing.chunkDocs(docs, "id", "text", 64, 48).collect()
    assert(got.length === 1)
    assert(got.head.getAs[String]("chunk_text") === "just three tokens")
  }

  test("bucket size does not change the layout (pure decomposition knob)") {
    val docs = (1L to 300L).map(i => (i, ((i * 13) % 40 + 1).toInt)).toDF("id", "ntok")
    val a = Packing.packAssignments(docs, "id", col("ntok"), 128, bucketSize = 10)
      .orderBy("id").collect().toSeq
    val b = Packing.packAssignments(docs, "id", col("ntok"), 128, bucketSize = 1000)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("cdcChunks: chunks tile the document exactly, boundaries content-chosen") {
    val text = (1 to 200).map(i => s"w${(i * 7) % 23}").mkString(" ")
    val docs = Seq((1L, text)).toDF("id", "text")
    val rows = Packing.cdcChunks(docs, "id", "text", n = 3, divisor = 8L)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.head._2 === 1L)                       // first chunk starts at 1
    assert(rows.map(_._3).sum === 200L)               // tiles the full doc
    rows.sliding(2).foreach { case Array((_, s1, w1), (_, s2, _)) =>
      assert(s2 === s1 + w1)                          // contiguous, no gaps
    case _ => ()
    }
    assert(rows.length > 5) // divisor 8 → many chunks over 200 tokens
  }

  test("cdcChunks: shift resistance — an edit realigns later chunks") {
    val base = (1 to 120).map(i => s"t${(i * 11) % 31}").mkString(" ")
    val edited = "INSERTED " + base
    val fps = Packing.cdcChunks(Seq((1L, base)).toDF("id", "text"), "id", "text",
        n = 3, divisor = 8L)
      .select("chunk_fp").as[Long].collect().toSet
    val fpsEdited = Packing.cdcChunks(Seq((1L, edited)).toDF("id", "text"), "id", "text",
        n = 3, divisor = 8L)
      .select("chunk_fp").as[Long].collect().toSet
    // most chunks survive a front insertion (fixed blocks would lose all)
    val survived = fps.intersect(fpsEdited).size.toDouble / fps.size
    assert(survived > 0.5, s"only ${survived * 100}% of chunks survived the edit")
  }

  test("cdcChunks: short docs yield one whole-document chunk") {
    val docs = Seq((1L, "a b")).toDF("id", "text")
    val rows = Packing.cdcChunks(docs, "id", "text").collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(3) === 2L)
  }

  test("cdcChunks plan: no shuffle (scan-stage array surgery)") {
    val docs = Seq((1L, "a b c d e")).toDF("id", "text")
    val plan = Packing.cdcChunks(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
