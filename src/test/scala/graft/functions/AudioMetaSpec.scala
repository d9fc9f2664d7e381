package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** audio_meta: golden WAV/FLAC payloads, the RIFF chunk walk (LIST before
  * fmt, odd-size pad byte), FLAC bitfield unpacking, and the null
  * contract — evaluated through the DataFrame path (whole-stage codegen).
  */
class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(hex: String): Option[(String, Int, Int, Int, Long)] = {
    val rows = Seq(Tuple1(hexBytes(hex))).toDF("payload")
      .select(AudioMeta(col("payload")).as("d"))
      .select(col("d.format"), col("d.channels"), col("d.sample_rate"),
        col("d.bits"), col("d.duration_ms"))
      .collect()
    if (rows.head.isNullAt(0)) None
    else Some((rows.head.getString(0), rows.head.getInt(1), rows.head.getInt(2),
      rows.head.getInt(3), rows.head.getLong(4)))
  }

  // 16-bit stereo 44100 Hz: byteRate = 44100*2*2 = 176400 = 0x2B110
  private val fmt16 = "666D7420" + "10000000" + "0100" + "0200" +
    "44AC0000" + "10B10200" + "0400" + "1000"

  test("wav: canonical fmt+data layout") {
    // data size 352800 bytes = 2 seconds = 0x056220
    val wav = "52494646" + "00000000" + "57415645" + fmt16 +
      "64617461" + "20620500"
    assert(parse(wav) === Some(("wav", 2, 44100, 16, 2000L)))
  }

  test("wav: LIST chunk before fmt forces a real walk; odd size pads") {
    // LIST of size 5 (odd → 1 pad byte), then fmt, then data
    val list = "4C495354" + "05000000" + "494E464F41" + "00"
    val wav = "52494646" + "00000000" + "57415645" + list + fmt16 +
      "64617461" + "10B10200" // one second
    assert(parse(wav) === Some(("wav", 2, 44100, 16, 1000L)))
  }

  test("wav: data before fmt still resolves (walk skips the data body)") {
    // 8-byte data chunk WITH its body, then fmt — the walk must hop the
    // body to reach fmt
    val wav = "52494646" + "00000000" + "57415645" +
      "64617461" + "08000000" + "0011223344556677" + fmt16
    assert(parse(wav) === Some(("wav", 2, 44100, 16, 8L * 1000 / 176400)))
  }

  test("flac: STREAMINFO bitfields") {
    // srate 44100 = 0x0AC44 in 20 bits, channels 2 (enc 001), bits 16
    // (enc 01111), total samples 88200 (2 s) = 0x015888
    // byte18..20: srate<<4 | ch-1<<1 | bps-1 top bit: 0x0AC44 → bytes
    // 0A C4 4?; low nibble of byte20: ch(001)<<1 | bps_hi(0) = 0010 → 0x42
    // byte21: bps_lo(1111)<<4 | samples_hi(0) = 0xF0; bytes22-25: 00015888
    val flac = "664C6143" + "00" + "000022" +
      "1000" + "1000" + "000000" + "000000" +
      "0A" + "C4" + "42" + "F0" + "00015888" +
      "00000000000000000000000000000000" // md5 (16 bytes)
    assert(parse(flac) === Some(("flac", 2, 44100, 16, 2000L)))
  }

  test("mp3: golden frame headers, both versions, channel modes") {
    // FF FB = MPEG1 Layer III; 9x = 128 kbps, srIdx 0 = 44100; stereo.
    // 4 header bytes + 60 filler = 64 audio bytes → 64·8/128 = 4 ms
    val mp3 = "FFFB" + "90" + "00" + "00" * 60
    assert(parse(mp3) === Some(("mp3", 2, 44100, 0, 4L)))
    // mono (mode 11 → C0), srIdx 1 = 48000, brIdx B = 192 kbps
    val mono = "FFFB" + "B4" + "C0" + "00" * 92 // 96·8/192 = 4 ms
    assert(parse(mono) === Some(("mp3", 1, 48000, 0, 4L)))
    // MPEG2 (version bits 10 → b1 = F3): halved rates, MPEG2 table
    // brIdx 9 = 80 kbps, srIdx 0 → 22050
    val mpeg2 = "FFF3" + "90" + "00" + "00" * 44 // ⌊48·8/80⌋ = 4 ms
    assert(parse(mpeg2) === Some(("mp3", 2, 22050, 0, 4L)))
  }

  test("mp3: ID3v2 tag skips by syncsafe size; tag bytes carry no duration") {
    // ID3v2.3, syncsafe size 5, 5 tag bytes, then the golden frame
    val tagged = "494433" + "0300" + "00" + "00000005" + "41" * 5 +
      "FFFB" + "90" + "00" + "00" * 60
    assert(parse(tagged) === Some(("mp3", 2, 44100, 0, 4L)))
  }

  test("mp3: reserved version/layer and free/bad bitrates reject") {
    // every payload padded past the 12-byte entry guard, so each
    // assertion exercises the header-validation branch it names
    val pad = "00" * 12
    assert(parse("FFEB9000" + pad) === None) // version bits 01 (reserved)
    assert(parse("FFFD9000" + pad) === None) // layer bits 10 (Layer II)
    assert(parse("FFFB0000" + pad) === None) // bitrate index 0 (free)
    assert(parse("FFFBF000" + pad) === None) // bitrate index 15 (bad)
    assert(parse("FFFB9C00" + pad) === None) // sample-rate index 3 (reserved)
    assert(parse("494433" + "0300" + "00" + "00000005" + "00") === None) // ID3 then nothing
  }

  test("garbage and truncation return null, never throw") {
    assert(parse("DEADBEEFDEADBEEFDEADBEEF") === None)     // unknown magic
    assert(parse("524946460000000057415645") === None)      // WAV, no chunks
    assert(parse("524946460000000057415645666D7420") === None) // truncated fmt
    assert(parse("664C614300000022") === None)               // FLAC too short
    val rows = Seq(Tuple1(null: Array[Byte])).toDF("payload")
      .select(AudioMeta(col("payload")).as("d")).collect()
    assert(rows.head.isNullAt(0))
  }

  test("interpreted eval agrees with the codegen path") {
    val wav = "52494646" + "00000000" + "57415645" + fmt16 +
      "64617461" + "20620500"
    Seq(wav, "DEADBEEFDEADBEEFDEADBEEF").foreach { h =>
      val viaEval = Option(AudioMeta.parseRow(hexBytes(h)))
        .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
          r.getInt(3), r.getLong(4)))
      assert(viaEval === parse(h), s"eval/codegen divergence for $h")
    }
  }
}
