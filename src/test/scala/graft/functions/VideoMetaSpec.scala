package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** video_meta: golden ISO-BMFF trees (v0/v1 mvhd, sibling boxes before
  * mvhd, largesize and to-EOF boxes), and the null contract for garbage /
  * truncated / malformed payloads — evaluated through the DataFrame path,
  * i.e. inside whole-stage codegen.
  */
class VideoMetaSpec extends SparkSpec {
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(hex: String): Option[(String, Int, Long, Long)] = {
    val rows = Seq(Tuple1(hexBytes(hex))).toDF("payload")
      .select(VideoMeta(col("payload")).as("v"))
      .select(col("v.brand"), col("v.timescale"), col("v.duration"), col("v.duration_ms"))
      .collect()
    if (rows.head.isNullAt(0)) None
    else Some((rows.head.getString(0), rows.head.getInt(1),
      rows.head.getLong(2), rows.head.getLong(3)))
  }

  // 80-byte mvhd tail: rate, volume+reserved, reserved2, unity matrix,
  // pre_defined, next_track
  private val tail = "00010000" + "01000000" + ("0" * 16) +
    Seq("00010000", "00000000", "00000000", "00000000", "00010000",
      "00000000", "00000000", "00000000", "40000000").mkString +
    ("0" * 48) + "00000002"

  private val ftypIsom = "0000001066747970" + "69736F6D" + "00000000"
  // v0 mvhd: timescale 600, duration 3000 → 5000 ms
  private val mvhdV0 = "0000006C6D766864" + "00000000" + ("0" * 16) +
    "00000258" + "00000BB8" + tail
  // v1 mvhd: 64-bit creation/modification/duration
  private val mvhdV1 = "000000786D766864" + "01000000" + ("0" * 32) +
    "00000258" + "0000000000000BB8" + tail

  test("ftyp + moov(mvhd v0): brand, timescale, duration, derived ms") {
    val moov = "000000746D6F6F76" + mvhdV0 // 8 + 108 = 116 = 0x74
    assert(parse(ftypIsom + moov) === Some(("isom", 600, 3000L, 5000L)))
  }

  test("v1 mvhd (64-bit fields) parses identically") {
    val moov = "000000806D6F6F76" + mvhdV1 // 8 + 120 = 128 = 0x80
    assert(parse(ftypIsom + moov) === Some(("isom", 600, 3000L, 5000L)))
  }

  test("sibling boxes before mvhd are skipped by declared size") {
    val free = "0000000C66726565" + "00000000" // 12-byte free child
    val moov = "000000806D6F6F76" + free + mvhdV0 // 8 + 12 + 108 = 128
    val mdat = "0000000A6D646174" + "0000" // top-level mdat between ftyp and moov
    assert(parse(ftypIsom + mdat + moov) === Some(("isom", 600, 3000L, 5000L)))
  }

  test("largesize (size=1 + 64-bit) top-level box is walked correctly") {
    // mdat with size=1, largesize=18 (16 header + 2 payload)
    val mdat = "000000016D646174" + "0000000000000012" + "0000"
    val moov = "000000746D6F6F76" + mvhdV0
    assert(parse(ftypIsom + mdat + moov) === Some(("isom", 600, 3000L, 5000L)))
  }

  test("size=0 (to end of file) moov still yields mvhd") {
    val moov = "000000006D6F6F76" + mvhdV0
    assert(parse(ftypIsom + moov) === Some(("isom", 600, 3000L, 5000L)))
  }

  test("duration_ms truncates toward zero like integer division") {
    // timescale 48000, duration 1001 → 20.854…ms → 20
    val mvhd = "0000006C6D766864" + "00000000" + ("0" * 16) +
      "0000BB80" + "000003E9" + tail
    val moov = "000000746D6F6F76" + mvhd
    assert(parse(ftypIsom + moov) === Some(("isom", 48000, 1001L, 20L)))
  }

  test("garbage, truncation, and malformed sizes return null, never throw") {
    assert(parse("DEADBEEF" + ("00" * 20)) === None)       // unknown first box
    assert(parse(ftypIsom) === None)                        // no moov
    assert(parse(ftypIsom + "000000746D6F6F76") === None)   // moov truncated
    assert(parse("0000000366747970") === None)              // box smaller than header
    // mvhd with an unknown version byte
    val badV = "0000006C6D766864" + "02000000" + ("0" * 16) +
      "00000258" + "00000BB8" + tail
    assert(parse(ftypIsom + "00000074" + "6D6F6F76" + badV) === None)
    // mvhd declaring a size too small for its fields must NOT read its
    // sibling's bytes as timescale/duration
    val tinyMvhd = "0000000C6D766864" + "00000000" // declared 12 bytes
    val sibling = "0000006C66726565" + ("0" * 200)
    assert(parse(ftypIsom + "000000806D6F6F76" + tinyMvhd + sibling) === None)
    // ftyp declaring size 8 must not read the next box as its brand
    assert(parse("0000000866747970" + "000000746D6F6F76" + mvhdV0) === None)
  }

  test("interpreted eval matches codegen") {
    val payload = hexBytes(ftypIsom + "000000746D6F6F76" + mvhdV0)
    val expr = VideoMeta(org.apache.spark.sql.catalyst.expressions.Literal
      .create(payload, org.apache.spark.sql.types.BinaryType))
    val interpreted = expr.eval(null)
    assert(interpreted != null)
    val row = interpreted.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getInt(1) === 600 && row.getLong(2) === 3000L)
  }
}
