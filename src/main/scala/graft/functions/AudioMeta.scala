package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio-container metadata parsing as a native expression:
  * `audio_meta(payload)` → `struct<format string, channels int,
  * sample_rate int, bits int, duration_ms long>`, NULL for unrecognized
  * or truncated payloads — the audio companion of [[MediaDims]] in the
  * multimodal ingest family: typed metadata from opaque blobs BEFORE any
  * decoder runs (routing, stats, duration-bucketed sharding of a 100 TB
  * audio corpus).
  *
  * WAV needs a REAL chunk walk (RIFF chunks are variable-length —
  * LIST/INFO/bext chunks commonly precede `fmt `; odd-sized chunks carry
  * a pad byte), so this is not expressible in fixed-offset Column
  * arithmetic; FLAC packs sample rate/channels/bits into bitfields of
  * the STREAMINFO block. One doGenCode'd static call keeps both walks
  * inside whole-stage codegen — no UDF, no fallback.
  *
  * duration_ms is integer arithmetic (`bytes·1000 div byte_rate`,
  * `samples·1000 div sample_rate`) — deterministic cross-engine, like
  * every quantity this expression emits.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_meta requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = AudioMeta.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"

  override protected def nullSafeEval(v: Any): Any =
    AudioMeta.parseRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.AudioMeta.parseRow($v);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {
  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Column form. */
  def apply(payload: Column): Column =
    GraftBridge.column(AudioMeta(GraftBridge.expression(payload)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def row(format: String, ch: Int, sr: Int, bits: Int, durMs: Long): InternalRow =
    if (ch <= 0 || sr <= 0 || bits <= 0 || durMs < 0) null
    else InternalRow(UTF8String.fromString(format), ch, sr, bits, durMs)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  /** Codegen entry point: parsed metadata or null. Allocation-light,
    * never throws.
    */
  def parseRow(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    // WAV: RIFF <size> WAVE, then a chunk walk to `fmt ` and `data`
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) {
      // Long cursor: a garbage/huge declared size (or a headers-only
      // payload whose `data` chunk has no body) just walks past the end
      // and exits — no Int overflow, no index out of range
      var i = 12L
      var ch = -1; var sr = -1; var bits = -1; var byteRate = -1L
      var dataSize = -1L
      while (i + 8 <= b.length && (ch < 0 || dataSize < 0)) {
        val at = i.toInt
        val size = le32(b, at + 4)
        if (tag(b, at, "fmt ")) {
          if (i + 8 + 16 > b.length || size < 16) return null
          ch = le16(b, at + 10)
          sr = le32(b, at + 12).toInt
          byteRate = le32(b, at + 16)
          bits = le16(b, at + 22)
        } else if (tag(b, at, "data")) {
          dataSize = size
        }
        // chunks are word-aligned: odd sizes carry one pad byte
        i += 8L + size + (size & 1L)
      }
      if (ch < 0 || dataSize < 0 || byteRate <= 0) return null
      return row("wav", ch, sr, bits, dataSize * 1000L / byteRate)
    }
    // FLAC: fLaC + STREAMINFO (first metadata block, type 0); sample
    // rate (20 bits), channels-1 (3), bits-1 (5), total samples (36)
    // packed starting at byte 18 of the stream
    if (tag(b, 0, "fLaC")) {
      if (b.length < 26 || (u8(b, 4) & 0x7f) != 0) return null
      val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
      val ch = ((u8(b, 20) >> 1) & 0x7) + 1
      val bits = (((u8(b, 20) & 0x1) << 4) | (u8(b, 21) >> 4)) + 1
      val totalSamples = ((u8(b, 21) & 0xfL) << 32) | be32(b, 22)
      if (sr == 0) return null
      return row("flac", ch, sr, bits, totalSamples * 1000L / sr)
    }
    null
  }
}
