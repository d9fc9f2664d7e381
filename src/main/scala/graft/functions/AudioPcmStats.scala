package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** PCM sample statistics straight off a 16-bit WAV payload —
  * `audio_pcm_stats(payload)` → `struct<n_samples, peak, sum_sq>` —
  * the first multimodal member that reads the SIGNAL, not just headers
  * ([[AudioMeta]] routes; this measures): exact loudness evidence
  * (peak = max |sample|, energy = Σ sample², both exact integers) for
  * silence detection, clipping audits, and energy-bucketed sharding of
  * an audio corpus, with no codec anywhere — 16-bit PCM in a WAV is
  * already the samples.
  *
  * The same RIFF chunk walk as [[AudioMeta]] (LIST/bext chunks skipped,
  * odd sizes padded) to `fmt ` (must declare PCM format 1 at 16 bits —
  * anything else is NULL, never a wrong number) and `data`, then one
  * tight loop over little-endian int16 samples. Magnitudes: n·32768² —
  * sum_sq outgrows Long only past ~8·10⁹ samples (~2 days of 48 kHz
  * stereo in ONE row; split longer payloads upstream), documented.
  * Truncated data chunks measure the samples actually present
  * (n_samples says how many — the honest partial answer), garbage is
  * NULL.
  */
case class AudioPcmStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_pcm_stats requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = AudioPcmStats.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_pcm_stats"

  override protected def nullSafeEval(v: Any): Any =
    AudioPcmStats.parseRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.AudioPcmStats.parseRow($v);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioPcmStats =
    copy(child = newChild)
}

object AudioPcmStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  /** Column form. */
  def apply(payload: Column): Column =
    GraftBridge.column(AudioPcmStats(GraftBridge.expression(payload)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  /** Codegen entry point: stats or null. Never throws. */
  def parseRow(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var i = 12L
    var fmtOk = false
    var dataAt = -1L
    var dataSize = -1L
    while (i + 8 <= b.length && (!fmtOk || dataAt < 0)) {
      val at = i.toInt
      val size = le32(b, at + 4)
      if (tag(b, at, "fmt ")) {
        if (i + 8 + 16 > b.length || size < 16) return null
        val audioFormat = le16(b, at + 8)
        val bits = le16(b, at + 22)
        if (audioFormat != 1 || bits != 16) return null // PCM16 only
        fmtOk = true
      } else if (tag(b, at, "data")) {
        dataAt = i + 8
        dataSize = size
      }
      i += 8L + size + (size & 1L)
    }
    if (!fmtOk || dataAt < 0) return null
    // truncated payload: measure the samples actually present
    val end = math.min(dataAt + dataSize, b.length.toLong)
    var p = dataAt
    var n = 0L
    var peak = 0L
    var sumSq = 0L
    while (p + 2 <= end) {
      val raw = le16(b, p.toInt)
      val s = if (raw >= 32768) raw - 65536 else raw
      val a = if (s < 0) -s.toLong else s.toLong
      if (a > peak) peak = a
      sumSq += s.toLong * s
      n += 1
      p += 2
    }
    InternalRow(n, peak, sumSq)
  }
}
