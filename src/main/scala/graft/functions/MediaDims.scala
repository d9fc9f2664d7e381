package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-format dimension parsing as a native expression:
  * `media_dims(payload)` → `struct<format string, width int, height int>`,
  * NULL for unrecognized or truncated payloads (reference surface: the
  * multimodal ingest family — typed metadata extracted from opaque blobs
  * BEFORE any decoder runs).
  *
  * [[graft.llm.Multimodal.pngWidth]] handles the fixed-offset PNG case in
  * pure Column arithmetic; this expression exists for the formats Column
  * arithmetic cannot express: JPEG dimensions live in a SOF segment at a
  * VARIABLE offset (each APPn/DQT/... segment declares its own length and
  * must be walked), GIF and BMP are little-endian (conv() reads
  * big-endian hex). One doGenCode'd static call keeps the parse inside
  * whole-stage codegen — no UDF, no fallback, scan-stage cost only.
  *
  * Formats: PNG (IHDR big-endian u32 pair), GIF87a/89a (logical-screen
  * little-endian u16 pair), JPEG (segment walk to SOF0/1/2/5/6/7/9/A/B/
  * D/E/F), BMP (BITMAPINFOHEADER little-endian i32 pair).
  */
case class MediaDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_dims requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = MediaDims.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "media_dims"

  override protected def nullSafeEval(v: Any): Any =
    MediaDims.parseRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.MediaDims.parseRow($v);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MediaDims =
    copy(child = newChild)
}

object MediaDims {
  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Column form. */
  def apply(payload: Column): Column =
    GraftBridge.column(MediaDims(GraftBridge.expression(payload)))

  // unsigned byte/word readers ------------------------------------------------
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def row(format: String, w: Long, h: Long): InternalRow =
    // dimensions that overflow Int (corrupt headers) are "not parseable"
    if (w < 0 || h < 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else InternalRow(UTF8String.fromString(format), w.toInt, h.toInt)

  /** Codegen entry point: parsed dims or null (unknown/truncated). Called
    * once per row from generated code — must stay allocation-light and
    * never throw.
    */
  def parseRow(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // PNG: 89 50 4E 47 0D 0A 1A 0A, IHDR dims at 16/20 big-endian
    if (b.length >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a/GIF89a: logical screen w/h little-endian u16 at 6/8
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // BMP: 'BM', BITMAPINFOHEADER w/h little-endian i32 at 18/22 (negative
    // height = top-down rows; dimensions are the magnitudes)
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val w = le32(b, 18).toInt
      val h = le32(b, 22).toInt
      return row("bmp", math.abs(w.toLong), math.abs(h.toLong))
    }
    // JPEG: FF D8, then a segment walk — every segment is FF <marker>
    // <len:be16 including itself>; dims are in the first SOFn frame header
    // (height at +5, width at +7 from the marker). C4/C8/CC are NOT frame
    // headers (huffman/arithmetic tables) despite sitting in the C0-CF range.
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return null // desynced — not a valid stream
        val marker = u8(b, i + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone markers carry no length
        } else if (marker >= 0xc0 && marker <= 0xcf &&
                   marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 8 >= b.length) return null
          return row("jpeg", be16(b, i + 7), be16(b, i + 5))
        } else if (marker == 0xd9 || marker == 0xda) {
          return null // EOI / entropy-coded data before any SOF
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return null
          i += 2 + len
        }
      }
      return null
    }
    null
  }

  /** Struct → columns convenience for gate/select use. */
  def dims(payload: Column): (Column, Column, Column) = {
    val d = apply(payload)
    (d.getField("format"), d.getField("width"), d.getField("height"))
  }
}
