package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators. The media codecs themselves (JPEG/PNG/WAV decoders) are NOT in
  * this container, so the decode step is pluggable ([[MediaCodec]]) with a
  * deterministic fake for tests — the Spark-side plumbing (schema, per-batch
  * partition iteration, feature shapes) is real and is what matters at
  * scale: payload bytes stream through `mapPartitions` one partition batch
  * at a time, never collected, and feature output is a fixed-width
  * `Array[Float]` column ready for the [[Similarity]] operators.
  */
object Multimodal {

  /** Typed metadata carried next to a payload column. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),       // image | audio | video | text
    StructField("mime", StringType),
    StructField("width", IntegerType),     // images/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType))) // audio/video

  /** Pluggable decoder: payload bytes → fixed-width feature vector.
    * Implementations must be deterministic and serializable (executed on
    * executors inside mapPartitions).
    */
  trait MediaCodec extends Serializable {
    def featureDim: Int
    def decodeFeatures(payload: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in for a real image/audio decoder: a normalized
    * 16-bin byte histogram. Real codecs (JPEG → pixels → embedding) drop in
    * behind the same trait without touching the plumbing.
    */
  final class ByteHistogramCodec extends MediaCodec {
    val featureDim = 16
    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val h = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) { h((payload(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(1, payload.length).toFloat
      h.map(_ / n)
    }
  }

  /** Column-level payload metrics (codegen'd, engine-portable — the
    * gate-checkable surface): byte length, content hash, base64 head.
    */
  def nBytes(payload: Column): Column = length(payload).cast(LongType)
  def contentHash(payload: Column): Column = md5(payload)
  def b64Head(payload: Column, n: Int): Column = substring(base64(payload), 1, n)

  /** Frame sampling: n evenly-strided fixed-length byte windows of the
    * payload (for video this is "every k-th frame"; here frames are byte
    * ranges — the decoder behind [[MediaCodec]] owns real frame boundaries).
    * Pure Column combinator: substring on binary is codegen'd.
    */
  def frameSample(payload: Column, frames: Int, frameLen: Int): Column = {
    val total = length(payload)
    array((0 until frames).map { i =>
      // frame i starts at floor(i * len / frames), 1-based substring
      substring(payload, (floor(total * i / frames) + 1).cast(IntegerType), lit(frameLen))
    }: _*)
  }

  /** Decode payloads to feature vectors, partition-batched: the codec runs
    * once per row inside mapPartitions — no driver round-trip, no shuffle;
    * output schema = input id + `features` array<float>.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String,
                     codec: MediaCodec): DataFrame = {
    val sess = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val input = df.select(col(idCol), col(payloadCol))
    val rdd = input.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.get(0), codec.decodeFeatures(bytes).toSeq)
      }
    }
    sess.createDataFrame(rdd, outSchema)
  }
}
