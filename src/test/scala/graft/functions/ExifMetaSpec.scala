package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EXIF: golden fixtures in both byte orders, the per-order value-slot
  * offsets, marker-walk skipping, absent-tag honesty, malformed NULLs,
  * codegen pin.
  */
class ExifMetaSpec extends SparkSpec {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private val app0 = "FFE0 0010 4A46494600" + "00" * 9

  private def jpegII(or: Int): String =
    "FFD8 " + app0 + " FFE1 0022 457869660000" +
      " 49492A00 08000000" + " 0100" +
      " 1201 0300 01000000 " + f"$or%02x" + "000000" + " 00000000"

  private def jpegMM(or: Int): String =
    "FFD8 " + app0 + " FFE1 0022 457869660000" +
      " 4D4D002A 00000008" + " 0001" +
      " 0112 0003 00000001 00" + f"$or%02x" + "0000" + " 00000000"

  test("little-endian: marker walk past APP0, value in the low slot") {
    val r = ExifMeta.parseRow(hexBytes(jpegII(6)))
    assert(r.getString(0) == "II" && r.getInt(1) == 6 && r.getInt(2) == 1)
  }

  test("big-endian: same tag, value slot offsets differ per byte order") {
    val r = ExifMeta.parseRow(hexBytes(jpegMM(8)))
    assert(r.getString(0) == "MM" && r.getInt(1) == 8 && r.getInt(2) == 1)
  }

  test("EXIF present but no orientation tag: 0 with the entry count") {
    // one entry, tag 0x010F (Make) ASCII count 4 inline
    val h = "FFD8 FFE1 0022 457869660000 49492A00 08000000 0100" +
      " 0F01 0200 04000000 61626300 00000000"
    val r = ExifMeta.parseRow(hexBytes(h))
    assert(r.getInt(1) == 0 && r.getInt(2) == 1)
  }

  test("malformed payloads are NULL, never a wrong number") {
    val cases = Seq(
      "FFD9",                      // not a JPEG
      "FFD8",                      // no segments
      "FFD8 FFDA 0002",            // image data before any APP1
      "FFD8 FFE1 0008 457869660000", // APP1 too short for TIFF
      "FFD8 " + app0,              // no APP1 at all (walk hits end)
      jpegII(3).replace("49492A00", "49492B00")) // bad TIFF magic
    cases.foreach { h =>
      assert(ExifMeta.parseRow(hexBytes(h)) == null, s"expected NULL for $h")
    }
  }

  test("truncated IFD entry table is NULL") {
    // claims 2 entries but carries bytes for one
    val h = "FFD8 FFE1 0022 457869660000 49492A00 08000000 0200" +
      " 1201 0300 01000000 06000000 00000000"
    assert(ExifMeta.parseRow(hexBytes(h)) == null)
  }

  test("runs inside whole-stage codegen over a parquet scan") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(expr(s"unhex('${jpegII(5).replaceAll("\\s", "")}')").as("p"))
    val out = real.select(ExifMeta(col("p")).as("m"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
    val r = out.head().getStruct(0)
    assert(r.getString(0) == "II" && r.getInt(1) == 5)
  }
}
