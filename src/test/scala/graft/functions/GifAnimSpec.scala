package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GIF animation: golden multi-frame fixtures with delays and the
  * NETSCAPE loop, color-table skips, absent-loop honesty, malformed
  * and truncated NULLs, codegen pin.
  */
class GifAnimSpec extends SparkSpec {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private val header = "474946383961 0100 0100 00 00 00" // GIF89a 1x1, no GCT
  private def gce(delayCs: Int) =
    "21F904 00 " + f"${delayCs & 0xff}%02x${(delayCs >> 8) & 0xff}%02x" + " 00 00"
  private val frame = "2C 0000 0000 0100 0100 00 02 024C01 00"
  private def netscape(loops: Int) =
    "21FF0B 4E45545343415045322E30 03 01 " +
      f"${loops & 0xff}%02x${(loops >> 8) & 0xff}%02x" + " 00"
  private val trailer = "3B"

  test("two delayed frames with an infinite loop") {
    val h = header + netscape(0) + gce(10) + frame + gce(25) + frame + trailer
    val r = GifAnim.parseRow(hexBytes(h))
    assert(r.getInt(0) == 2 && r.getLong(1) == 35L && r.getInt(2) == 0)
  }

  test("a still GIF: one frame, no delay, loops -1 (no extension)") {
    val r = GifAnim.parseRow(hexBytes(header + frame + trailer))
    assert(r.getInt(0) == 1 && r.getLong(1) == 0L && r.getInt(2) == -1)
  }

  test("global and local color tables skip by their declared sizes") {
    // GCT flag set, size bits 001 -> 4 entries = 12 bytes; local table
    // on the frame with size 000 -> 2 entries = 6 bytes
    val hdrGct = "474946383961 0100 0100 A1 00 00" + "00" * 12
    val frameLct = "2C 0000 0000 0100 0100 80" + "00" * 6 + " 02 024C01 00"
    val r = GifAnim.parseRow(hexBytes(hdrGct + frameLct + trailer))
    assert(r.getInt(0) == 1)
  }

  test("comment extensions hop; a 300-frame bomb counts without decoding") {
    val comment = "21FE 03 414243 00"
    val many = header + comment + Seq.fill(300)(frame).mkString + trailer
    val r = GifAnim.parseRow(hexBytes(many))
    assert(r.getInt(0) == 300)
  }

  test("malformed payloads are NULL") {
    val cases = Seq(
      "47494638",                        // too short
      "50494638 3961 0100 0100 00 00 00 3B", // bad signature
      header + frame,                    // no trailer (truncated)
      header + "2C 0000",                // truncated descriptor
      header + "7F" + trailer)           // unknown block type
    cases.foreach { h =>
      assert(GifAnim.parseRow(hexBytes(h)) == null, s"expected NULL for $h")
    }
  }

  test("codegen span over a parquet scan") {
    val h = (header + gce(7) + frame + trailer).replaceAll("\\s", "")
    val out = spark.read.parquet(s"$sf/documents.parquet")
      .select(GifAnim(expr(s"unhex('$h')")).as("m"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
    val r = out.head().getStruct(0)
    assert(r.getInt(0) == 1 && r.getLong(1) == 7L)
  }
}
