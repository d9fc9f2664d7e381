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

  // ------------------------------------------------- header introspection --
  // Real container-format parsing over the payload's hex image: magic-byte
  // MIME sniffing and PNG IHDR dimensions. hex() + substring + conv are all
  // codegen'd Column ops and replay identically in DuckDB — typed metadata
  // without any codec, exactly what an ingest pipeline runs BEFORE deciding
  // which decoder to route a blob to.

  private def hexPrefix(payload: Column, from: Int, len: Int): Column =
    substring(hex(payload), from, len)

  /** Magic-byte MIME detection (PNG / JPEG / GIF / RIFF-WAVE). */
  def sniffMime(payload: Column): Column =
    when(hexPrefix(payload, 1, 8) === "89504E47", "image/png")
      .when(hexPrefix(payload, 1, 6) === "FFD8FF", "image/jpeg")
      .when(hexPrefix(payload, 1, 12) === "474946383761" ||
            hexPrefix(payload, 1, 12) === "474946383961", "image/gif")
      .when(hexPrefix(payload, 1, 8) === "52494646" &&
            hexPrefix(payload, 17, 8) === "57415645", "audio/wav")
      .otherwise("application/octet-stream")

  /** Media kind from the sniffed mime ("image"/"audio"/"binary"). */
  def mediaKind(payload: Column): Column = {
    val m = sniffMime(payload)
    when(m.startsWith("image/"), "image")
      .when(m.startsWith("audio/"), "audio")
      .otherwise("binary")
  }

  /** PNG IHDR width/height: big-endian u32 at payload bytes 17-20 / 21-24
    * (hex chars 33-40 / 41-48), NULL for non-PNG payloads.
    */
  def pngWidth(payload: Column): Column =
    when(hexPrefix(payload, 1, 8) === "89504E47",
      conv(hexPrefix(payload, 33, 8), 16, 10).cast(LongType))
  def pngHeight(payload: Column): Column =
    when(hexPrefix(payload, 1, 8) === "89504E47",
      conv(hexPrefix(payload, 41, 8), 16, 10).cast(LongType))

  // DuckDB oracle forms of the header introspection — generated from the
  // same magic constants so the two sides cannot drift.
  def sniffMimeSql(e: String): String =
    s"""CASE WHEN substr(hex($e),1,8) = '89504E47' THEN 'image/png'
       | WHEN substr(hex($e),1,6) = 'FFD8FF' THEN 'image/jpeg'
       | WHEN substr(hex($e),1,12) IN ('474946383761','474946383961') THEN 'image/gif'
       | WHEN substr(hex($e),1,8) = '52494646' AND substr(hex($e),17,8) = '57415645' THEN 'audio/wav'
       | ELSE 'application/octet-stream' END""".stripMargin.replace("\n", "")
  def mediaKindSql(e: String): String =
    s"""CASE WHEN substr(hex($e),1,8) = '89504E47' OR substr(hex($e),1,6) = 'FFD8FF'
       |   OR substr(hex($e),1,12) IN ('474946383761','474946383961') THEN 'image'
       | WHEN substr(hex($e),1,8) = '52494646' AND substr(hex($e),17,8) = '57415645' THEN 'audio'
       | ELSE 'binary' END""".stripMargin.replace("\n", "")
  def pngWidthSql(e: String): String =
    s"CASE WHEN substr(hex($e),1,8) = '89504E47' THEN CAST(('0x'||substr(hex($e),33,8)) AS BIGINT) END"
  def pngHeightSql(e: String): String =
    s"CASE WHEN substr(hex($e),1,8) = '89504E47' THEN CAST(('0x'||substr(hex($e),41,8)) AS BIGINT) END"

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
    * once per row inside a typed `mapPartitions` — no driver round-trip, no
    * shuffle, and no RDD/GenericRow detour (the Dataset encoder path keeps
    * serialization in Tungsten format). Ids are widened to long (every table
    * id here is integral). Output schema: (idCol long, features
    * array<float>) — ready for the [[Similarity]] operators.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String,
                     codec: MediaCodec): DataFrame = {
    val sess = df.sparkSession
    import sess.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, codec.decodeFeatures(bytes)) })
      .toDF(idCol, "features")
  }
}
