package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video-container metadata as a native expression: `video_meta(payload)`
  * → `struct<brand string, timescale int, duration bigint, duration_ms
  * bigint>` from an ISO-BMFF (MP4/MOV) header, NULL for unrecognized or
  * truncated payloads — the multimodal-ingest step that lets a curation
  * pipeline bucket/filter video blobs by duration and container brand
  * BEFORE any decoder runs (the decode itself needs codec libraries; the
  * CONTAINER walk is pure byte arithmetic and belongs in the scan stage).
  *
  * Real structure, really walked: ISO-BMFF is a tree of length-prefixed
  * boxes (`[u32 size]['4cc' type]`, size 1 → 64-bit largesize follows,
  * size 0 → box extends to EOF). `ftyp` yields the major brand; `mvhd`
  * (inside `moov`, at any child position) yields timescale + duration in
  * version-0 (u32) or version-1 (u64) layout. Boxes between and around
  * them (`free`, `mdat`, `iods`, ...) are skipped by declared size — a
  * parser that assumes fixed offsets dies on the first real file.
  *
  * Same execution contract as [[MediaDims]]/[[AudioMeta]]: one
  * doGenCode'd static call inside whole-stage codegen, allocation-light,
  * never throws; Long cursors so corrupt declared sizes walk off the end
  * instead of overflowing.
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_meta requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = VideoMeta.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"

  override protected def nullSafeEval(v: Any): Any =
    VideoMeta.parseRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.VideoMeta.parseRow($v);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {
  val Schema: StructType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Column form. */
  def apply(payload: Column): Column =
    GraftBridge.column(VideoMeta(GraftBridge.expression(payload)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  private def is(b: Array[Byte], i: Int, s: String): Boolean =
    s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  /** Box size at `i` with header length, or (-1, _) when malformed /
    * truncated. Returns (totalSize, headerLen).
    */
  private def boxSize(b: Array[Byte], i: Long): (Long, Int) = {
    if (i + 8 > b.length) return (-1L, 0)
    val s = be32(b, i.toInt)
    if (s == 0) (b.length - i, 8) // to end of file
    else if (s == 1) {
      if (i + 16 > b.length) (-1L, 0)
      else (be64(b, i.toInt + 8), 16)
    } else (s, 8)
  }

  /** Codegen entry point: parsed metadata or null. Allocation-light,
    * never throws.
    */
  def parseRow(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    // sniff: the first box must be well-formed and a known top-level type
    if (!is(b, 4, "ftyp") && !is(b, 4, "moov") && !is(b, 4, "free") &&
        !is(b, 4, "mdat") && !is(b, 4, "wide") && !is(b, 4, "skip")) return null
    var brand: String = null
    var timescale = -1
    var duration = -1L
    var i = 0L
    while (i + 8 <= b.length && (brand == null || timescale < 0)) {
      val (size, hdr) = boxSize(b, i)
      if (size < hdr) return null // malformed: box smaller than its header
      val at = i.toInt
      if (is(b, at + 4, "ftyp")) {
        // bound by the DECLARED size too: a size-8 ftyp must not read the
        // next box's bytes as its brand
        if (i + hdr + 4 > b.length || hdr + 4 > size) return null
        brand = fourcc(b, at + hdr)
      } else if (is(b, at + 4, "moov")) {
        // child walk: mvhd may sit after any number of sibling boxes
        val end = math.min(i + size, b.length.toLong)
        var j = i + hdr
        while (j + 8 <= end && timescale < 0) {
          val (csize, chdr) = boxSize(b, j)
          if (csize < chdr) return null
          val cat = j.toInt
          if (is(b, cat + 4, "mvhd")) {
            // field reads bounded by the payload AND the declared box
            // size — a truncated-size mvhd must not read its sibling's
            // bytes as timescale/duration
            val p = j + chdr
            if (p + 4 > b.length || chdr + 4 > csize) return null
            val version = u8(b, p.toInt)
            if (version == 0) {
              if (p + 20 > b.length || chdr + 20 > csize) return null
              timescale = be32(b, p.toInt + 12).toInt
              duration = be32(b, p.toInt + 16)
            } else if (version == 1) {
              if (p + 32 > b.length || chdr + 32 > csize) return null
              timescale = be32(b, p.toInt + 20).toInt
              duration = be64(b, p.toInt + 24)
            } else return null
          }
          j += csize
        }
      }
      i += size
    }
    if (brand == null || timescale <= 0 || duration < 0) return null
    // a structurally valid u64 duration can still overflow the *1000 ms
    // conversion — that payload is "not parseable" (NULL), never a wrapped
    // negative duration_ms
    if (duration > Long.MaxValue / 1000L) return null
    InternalRow(UTF8String.fromString(brand), timescale, duration,
      duration * 1000L / timescale)
  }
}
