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
  * the STREAMINFO block; MP3 (r8) needs an ID3v2 skip (syncsafe size)
  * followed by an MPEG-audio Layer III frame-header decode against the
  * version-specific bitrate/sample-rate tables. One doGenCode'd static
  * call keeps all three walks inside whole-stage codegen — no UDF, no
  * fallback.
  *
  * duration_ms is integer arithmetic (`bytes·1000 div byte_rate`,
  * `samples·1000 div sample_rate`; for MP3 the CBR estimate
  * `audio_bytes·8 div kbps` — exact for constant-bitrate streams, a
  * first-frame approximation for VBR, documented) — deterministic
  * cross-engine, like every quantity this expression emits. MP3 is a
  * lossy codec with no PCM bit depth: `bits` is 0 for it (the one format
  * where 0 is the honest answer, carved out of the >0 validity rule).
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
    // MP3: optional ID3v2 tag (10-byte header, SYNCSAFE 28-bit size),
    // then an MPEG audio frame header — Layer III only, the "mp3" case
    var off = 0L
    if (tag(b, 0, "ID3")) {
      off = 10L + (((u8(b, 6) & 0x7fL) << 21) | ((u8(b, 7) & 0x7fL) << 14) |
        ((u8(b, 8) & 0x7fL) << 7) | (u8(b, 9) & 0x7fL))
      // ID3v2.4 footer flag: 10 more bytes between tag and audio
      if ((u8(b, 5) & 0x10) != 0) off += 10L
    }
    if (off + 4 <= b.length) {
      val at = off.toInt
      if (u8(b, at) == 0xff && (u8(b, at + 1) & 0xe0) == 0xe0) {
        val b1 = u8(b, at + 1); val b2 = u8(b, at + 2); val b3 = u8(b, at + 3)
        val ver = (b1 >> 3) & 0x3   // 0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1
        val layer = (b1 >> 1) & 0x3 // 1 = Layer III
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        if (ver != 1 && layer == 1 && brIdx != 0 && brIdx != 15 && srIdx != 3) {
          val kbps =
            if (ver == 3) Mpeg1L3Kbps(brIdx) else Mpeg2L3Kbps(brIdx)
          val sr = ver match {
            case 3 => Mpeg1Rates(srIdx)
            case 2 => Mpeg1Rates(srIdx) / 2
            case _ => Mpeg1Rates(srIdx) / 4
          }
          val ch = if (((b3 >> 6) & 0x3) == 3) 1 else 2
          // CBR estimate over the audio bytes (payload past the ID3 tag):
          // ms = bytes·8·1000 / (kbps·1000) = bytes·8 / kbps
          val durMs = (b.length - off) * 8L / kbps
          return InternalRow(UTF8String.fromString("mp3"), ch, sr, 0, durMs)
        }
      }
    }
    null
  }

  // Layer III bitrate tables (kbps; index 0 = free and 15 = bad are
  // rejected above) and the MPEG1 sample rates (MPEG2 halves, 2.5
  // quarters them)
  private val Mpeg1L3Kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mpeg2L3Kbps = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val Mpeg1Rates = Array(44100, 48000, 32000)
}
