package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JPEG EXIF metadata as a native expression: `exif_meta(payload)` →
  * `struct<byte_order string, orientation int, n_ifd0 int>` — the
  * image companion a display/training pipeline needs BEFORE any decoder
  * runs (a photo stored rotated renders wrong unless orientation 1–8 is
  * honored; auto-rotate jobs route on exactly this tag). Deeper than
  * [[MediaDims]]' fixed-header reads: a real marker-segment walk (APP0
  * and friends skipped by their big-endian lengths) to APP1/"Exif\0\0",
  * then a TIFF header in EITHER byte order ("II" little, "MM" big) and
  * the IFD0 entry scan for tag 0x0112 (SHORT, inline value — whose
  * 2-byte slot sits at different offsets per byte order, the classic
  * EXIF-parser bug, spec-pinned both ways).
  *
  * NULL for anything malformed (not JPEG, no APP1, truncated segment,
  * bad TIFF magic) — never a wrong number; a present EXIF block with no
  * orientation tag reports orientation 0 with the entry count (the
  * honest "EXIF yes, tag absent" reading). One doGenCode static call,
  * the [[AudioMeta]] posture.
  */
case class ExifMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"exif_meta requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ExifMeta.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "exif_meta"

  override protected def nullSafeEval(v: Any): Any =
    ExifMeta.parseRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.ExifMeta.parseRow($v);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ExifMeta =
    copy(child = newChild)
}

object ExifMeta {
  val Schema: StructType = StructType(Seq(
    StructField("byte_order", StringType, nullable = false),
    StructField("orientation", IntegerType, nullable = false),
    StructField("n_ifd0", IntegerType, nullable = false)))

  def apply(payload: Column): Column =
    GraftBridge.column(ExifMeta(GraftBridge.expression(payload)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (be16(b, i).toLong << 16) | be16(b, i + 2)
  private def le32(b: Array[Byte], i: Int): Long =
    le16(b, i).toLong | (le16(b, i + 2).toLong << 16)

  /** Null on malformed; else (byte_order, orientation [0 = absent],
    * n_ifd0).
    */
  def parseRow(b: Array[Byte]): GenericInternalRow = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8)
      return null
    // marker walk: FF D8 then segments FF xx LEN(be16, incl itself)
    var i = 2
    var app1 = -1
    var guard = 0
    while (app1 < 0 && i + 4 <= b.length && guard < 64) {
      guard += 1
      if (u8(b, i) != 0xff) return null
      val marker = u8(b, i + 1)
      if (marker == 0xda || marker == 0xd9) return null // image data: no EXIF
      val len = be16(b, i + 2)
      if (len < 2 || i + 2 + len > b.length) return null
      if (marker == 0xe1 && len >= 8 &&
          b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
          b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
        app1 = i + 10 // TIFF header start
      else i = i + 2 + len
    }
    if (app1 < 0) return null
    val t = app1
    if (t + 8 > b.length) return null
    val little =
      if (b(t) == 'I' && b(t + 1) == 'I') true
      else if (b(t) == 'M' && b(t + 1) == 'M') false
      else return null
    def r16(i: Int) = if (little) le16(b, i) else be16(b, i)
    def r32(i: Int) = if (little) le32(b, i) else be32(b, i)
    if (r16(t + 2) != 42) return null
    val ifd0 = t + r32(t + 4).toInt
    if (ifd0 < t || ifd0 + 2 > b.length) return null
    val n = r16(ifd0)
    var orientation = 0
    var j = 0
    while (j < n) {
      val e = ifd0 + 2 + j * 12
      if (e + 12 > b.length) return null
      if (r16(e) == 0x0112 && r16(e + 2) == 3 && r32(e + 4) == 1L) {
        // SHORT, count 1: the value sits in the FIRST two bytes of the
        // 4-byte value slot in the file's byte order
        orientation = r16(e + 8)
      }
      j += 1
    }
    val row = new GenericInternalRow(3)
    row.update(0, UTF8String.fromString(if (little) "II" else "MM"))
    row.update(1, orientation)
    row.update(2, n)
    row
  }
}
