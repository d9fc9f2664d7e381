package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** GIF animation metadata as a native expression: `gif_anim(payload)`
  * → `struct<n_frames int, total_delay_cs long, loops int>` — the
  * triage read an image-corpus pipeline wants BEFORE any decoder runs
  * (animated GIFs route to video-style processing; a million-frame
  * bomb should be caught from metadata, not by decoding it).
  * [[MediaDims]] reads the logical-screen header; this walks the whole
  * BLOCK STREAM: graphic-control extensions (0x21 0xF9) carry each
  * frame's delay in centiseconds, image descriptors (0x2C) mark frames
  * (their local color tables and LZW data skip by the sub-block
  * length-hop — never decoded), the NETSCAPE2.0 application extension
  * carries the loop count (0 = forever; absent = play once, reported
  * −1 — the honest "no loop extension" reading), and the 0x3B trailer
  * ends the file.
  *
  * NULL for anything malformed (bad signature, truncated block, an
  * unknown block type) — never a wrong number; a structurally-valid
  * stream that simply ends without a trailer also returns NULL
  * (truncated uploads are the common corruption). One doGenCode'd
  * static call, the [[AudioMeta]] posture; the walk is bounded by the
  * payload length (every step advances).
  */
case class GifAnim(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gif_anim requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = GifAnim.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "gif_anim"

  override protected def nullSafeEval(v: Any): Any =
    GifAnim.parseRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.GifAnim.parseRow($v);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): GifAnim =
    copy(child = newChild)
}

object GifAnim {
  val Schema: StructType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("total_delay_cs", LongType, nullable = false),
    StructField("loops", IntegerType, nullable = false)))

  def apply(payload: Column): Column =
    GraftBridge.column(GifAnim(GraftBridge.expression(payload)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** Skip a sub-block chain starting at i; returns the index after the
    * 0 terminator, or -1 on overrun.
    */
  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var i = start
    while (i < b.length) {
      val len = u8(b, i)
      if (len == 0) return i + 1
      if (i + 1 + len > b.length) return -1
      i += 1 + len
    }
    -1
  }

  def parseRow(b: Array[Byte]): GenericInternalRow = {
    if (b == null || b.length < 14) return null
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    var i = 6
    val packed = u8(b, i + 4)
    i += 7 // logical screen descriptor
    if ((packed & 0x80) != 0) {
      i += 3 * (1 << ((packed & 7) + 1)) // global color table
      if (i >= b.length) return null
    }
    var frames = 0
    var delay = 0L
    var loops = -1
    while (i < b.length) {
      u8(b, i) match {
        case 0x3b => // trailer: done
          val row = new GenericInternalRow(3)
          row.update(0, frames); row.update(1, delay); row.update(2, loops)
          return row
        case 0x2c => // image descriptor
          if (i + 10 > b.length) return null
          val ipacked = u8(b, i + 9)
          i += 10
          if ((ipacked & 0x80) != 0) i += 3 * (1 << ((ipacked & 7) + 1))
          if (i + 1 > b.length) return null
          i += 1 // LZW minimum code size
          i = skipSubBlocks(b, i)
          if (i < 0) return null
          frames += 1
        case 0x21 => // extension
          if (i + 2 > b.length) return null
          val label = u8(b, i + 1)
          if (label == 0xf9) { // graphic control: delay at data bytes 1-2
            if (i + 7 > b.length || u8(b, i + 2) != 4) return null
            delay += le16(b, i + 4)
            i = skipSubBlocks(b, i + 2)
            if (i < 0) return null
          } else if (label == 0xff) { // application extension
            if (i + 3 > b.length) return null
            val alen = u8(b, i + 2)
            if (i + 3 + alen > b.length) return null
            val app = new String(b, i + 3, alen, "US-ASCII")
            val dataStart = i + 3 + alen
            if (app == "NETSCAPE2.0" && dataStart + 4 <= b.length &&
                u8(b, dataStart) == 3 && u8(b, dataStart + 1) == 1)
              loops = le16(b, dataStart + 2)
            i = skipSubBlocks(b, dataStart)
            if (i < 0) return null
          } else { // comment / plain text / unknown label: length-hop
            i = skipSubBlocks(b, i + 2)
            if (i < 0) return null
          }
        case _ => return null // unknown block type: corrupt
      }
    }
    null // ran off the end without a trailer: truncated upload
  }
}
