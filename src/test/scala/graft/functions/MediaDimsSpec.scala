package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** media_dims: golden headers per format, the JPEG segment walk (variable
  * APPn lengths, table segments in the C0-CF range that are NOT frame
  * headers), endianness, and the null contract for garbage/truncated
  * payloads — evaluated through the DataFrame path, i.e. inside
  * whole-stage codegen.
  */
class MediaDimsSpec extends SparkSpec {
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(hex: String): Option[(String, Int, Int)] = {
    val rows = Seq(Tuple1(hexBytes(hex))).toDF("payload")
      .select(MediaDims(col("payload")).as("d"))
      .select(col("d.format"), col("d.width"), col("d.height"))
      .collect()
    if (rows.head.isNullAt(0)) None
    else Some((rows.head.getString(0), rows.head.getInt(1), rows.head.getInt(2)))
  }

  test("png: IHDR big-endian dims") {
    assert(parse("89504E470D0A1A0A0000000D49484452" + "00000280" + "000001E0")
      === Some(("png", 640, 480)))
  }

  test("gif: little-endian logical screen dims, both versions") {
    assert(parse("474946383961" + "8002" + "E001" + "00") === Some(("gif", 640, 480)))
    assert(parse("474946383761" + "0A00" + "1400" + "00") === Some(("gif", 10, 20)))
  }

  test("bmp: little-endian i32 dims; top-down negative height normalized") {
    val pre = "424D" + "00000000" + "00000000" + "36000000" + "28000000"
    assert(parse(pre + "80020000" + "E0010000") === Some(("bmp", 640, 480)))
    // height -480 two's complement LE = 20FEFFFF
    assert(parse(pre + "80020000" + "20FEFFFF") === Some(("bmp", 640, 480)))
  }

  test("jpeg: walks APP0/DQT/DHT segments to SOF0; C4 is not a frame header") {
    val app0 = "FFE0" + "0010" + "4A46494600010101006000600000" // len 16
    val dqt = "FFDB" + "0005" + "000102"                        // len 5
    val dht = "FFC4" + "0004" + "0000"                          // DHT: would be misread as SOF if C4 untreated
    val sof = "FFC0" + "0011" + "08" + "01E0" + "0280" + "03011100021101031101"
    assert(parse("FFD8" + app0 + dqt + dht + sof + "FFD9")
      === Some(("jpeg", 640, 480)))
  }

  test("jpeg: SOF2 (progressive) also carries dims; EOI before SOF is null") {
    val sof2 = "FFC2" + "0011" + "08" + "0010" + "0020" + "03011100021101031101"
    assert(parse("FFD8" + sof2) === Some(("jpeg", 32, 16)))
    assert(parse("FFD8" + "FFD9") === None)
  }

  test("garbage, truncation and desync return null, never throw") {
    assert(parse("DEADBEEF00000000000000000000") === None)  // unknown magic
    assert(parse("89504E470D0A1A0A00000000") === None)       // PNG too short
    assert(parse("FFD8" + "FFE0" + "0001") === None)          // JPEG len < 2
    assert(parse("FFD8" + "00C0" + "0011") === None)          // desynced marker
    assert(parse("47494638") === None)                         // truncated GIF magic
    val rows = Seq(Tuple1(null: Array[Byte])).toDF("payload")
      .select(MediaDims(col("payload")).as("d")).collect()
    assert(rows.head.isNullAt(0))
  }

  test("interpreted eval agrees with the codegen path") {
    val hexes = Seq(
      "89504E470D0A1A0A0000000D49484452" + "00000280" + "000001E0",
      "474946383961" + "8002" + "E001" + "00",
      "FFD8" + "FFC0" + "0011" + "08" + "01E0" + "0280" + "03011100021101031101",
      "DEADBEEF00000000000000000000")
    hexes.foreach { h =>
      val viaEval = Option(MediaDims.parseRow(hexBytes(h)))
        .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))
      assert(viaEval === parse(h), s"eval/codegen divergence for $h")
    }
  }
}
