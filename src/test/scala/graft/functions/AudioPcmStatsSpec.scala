package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCM stats: golden hand-built WAV, truncation honesty, non-PCM16 and
  * garbage NULLs, chunk-walk robustness, codegen pin.
  */
class AudioPcmStatsSpec extends SparkSpec {

  import spark.implicits._

  /** Minimal PCM16 mono WAV around the given samples. */
  private def wav(samples: Seq[Int], extraChunk: Boolean = false,
                  bits: Int = 16, fmt: Int = 1): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(bs: Int*): Unit = bs.foreach(b => bos.write(b & 0xff))
    def le16(v: Int): Unit = w(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int): Unit = w(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def tag(s: String): Unit = s.foreach(c => bos.write(c))
    tag("RIFF"); le32(0); tag("WAVE")
    if (extraChunk) { tag("LIST"); le32(3); w(1, 2, 3, 0) } // odd size + pad
    tag("fmt "); le32(16); le16(fmt); le16(1); le32(8000); le32(16000)
    le16(2); le16(bits)
    tag("data"); le32(samples.length * 2)
    samples.foreach(le16)
    bos.toByteArray
  }

  test("golden samples: exact n/peak/energy including negatives") {
    val samples = Seq(0, 100, 0xFF9C /* -100 */, 32767, 0x8000 /* -32768 */)
    val df = Seq(Tuple1(wav(samples))).toDF("b")
    val r = df.select(AudioPcmStats(col("b")).as("st")).select("st.*").head()
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 32768L)
    assert(r.getLong(2) == 0L + 100L * 100 + 100L * 100 +
      32767L * 32767 + 32768L * 32768)
  }

  test("chunk walk skips a padded LIST chunk before fmt") {
    val df = Seq(Tuple1(wav(Seq(7), extraChunk = true))).toDF("b")
    val r = df.select(AudioPcmStats(col("b")).as("st")).select("st.*").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 7L && r.getLong(2) == 49L)
  }

  test("truncated data measures the samples present; declared size honest") {
    val full = wav(Seq(10, 20, 30))
    val truncated = full.dropRight(2) // lose the last sample
    val df = Seq(Tuple1(truncated)).toDF("b")
    val r = df.select(AudioPcmStats(col("b")).as("st")).select("st.*").head()
    assert(r.getLong(0) == 2L)
    assert(r.getLong(2) == 100L + 400L)
  }

  test("non-PCM16 and garbage payloads are NULL, never a wrong number") {
    val cases = Seq(
      wav(Seq(1), bits = 8),             // wrong bit depth
      wav(Seq(1), fmt = 3),              // float format
      "notawav".getBytes("UTF-8"),       // garbage
      Array[Byte](0x52, 0x49))           // truncated magic
    cases.foreach { payload =>
      val r = Seq(Tuple1(payload)).toDF("b")
        .select(AudioPcmStats(col("b")).as("st")).head()
      assert(r.isNullAt(0), s"expected NULL for ${payload.length}-byte payload")
    }
  }

  test("stays inside whole-stage codegen; SQL registration answers") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(unhex(concat(lit("52494646"), lpad(hex(col("doc_id")), 8, "0"))).as("b"))
    val plan = docs.select(AudioPcmStats(col("b")).as("st"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT audio_pcm_stats(CAST(NULL AS BINARY))").head()
    assert(viaSql.isNullAt(0))
  }
}
