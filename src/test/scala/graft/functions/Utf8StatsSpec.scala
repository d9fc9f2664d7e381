package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UTF-8 stats: golden sequences for every arm of the DFA — multi-byte
  * widths, overlongs, surrogates, truncation, orphan continuations,
  * mojibake markers — plus codegen and SQL registration.
  */
class Utf8StatsSpec extends SparkSpec {

  import spark.implicits._

  private def stats(bytes: Array[Byte]): (Long, Long, Long, Long) = {
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(Utf8Stats(col("b")).as("st")).select("st.*").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }
  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("clean text across widths: ascii, 2-, 3-, 4-byte chars") {
    // 'a' + £ (C2A3) + € (E282AC) + 😀 (F09F9880)
    val (nb, nc, ni, nr) = stats(hexBytes("61C2A3E282ACF09F9880"))
    assert((nb, nc, ni, nr) == ((10L, 4L, 0L, 0L)))
  }

  test("overlong and surrogate encodings are invalid with per-byte resync") {
    // C0 80 overlong NUL: 2 invalid; ED A0 80 surrogate: lead fails the
    // ED second-byte cap, then two orphan continuations = 3 invalid
    assert(stats(hexBytes("C080")) == ((2L, 0L, 2L, 0L)))
    assert(stats(hexBytes("EDA080")) == ((3L, 0L, 3L, 0L)))
    // ED 9F BF (U+D7FF, just below surrogates) is VALID
    assert(stats(hexBytes("ED9FBF")) == ((3L, 1L, 0L, 0L)))
    // E0 A0 80 (U+0800) valid; E0 80 80 overlong invalid (1 lead + 2 orphans)
    assert(stats(hexBytes("E0A080")) == ((3L, 1L, 0L, 0L)))
    assert(stats(hexBytes("E08080")) == ((3L, 0L, 3L, 0L)))
  }

  test("truncated trailing sequence and orphan continuation bytes") {
    // valid 'a' then E2 82 with the third byte missing: E2 invalid, 82 orphan
    assert(stats(hexBytes("61E282")) == ((3L, 1L, 2L, 0L)))
    // bare continuation and F5 (never a lead)
    assert(stats(hexBytes("80F5")) == ((2L, 0L, 2L, 0L)))
  }

  test("replacement chars count as mojibake AND as valid chars") {
    // "ab" + two U+FFFD
    val (nb, nc, ni, nr) = stats(hexBytes("6162EFBFBDEFBFBD"))
    assert((nb, nc, ni, nr) == ((8L, 4L, 0L, 2L)))
    // a real U+FFFE-adjacent char EF BF BE is valid but NOT a replacement
    assert(stats(hexBytes("EFBFBE")) == ((3L, 1L, 0L, 0L)))
  }

  test("empty and null payloads") {
    assert(stats(Array.emptyByteArray) == ((0L, 0L, 0L, 0L)))
    val r = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("b")
      .select(Utf8Stats(col("b")).as("st")).head()
    assert(r.isNullAt(0))
  }

  test("stays inside whole-stage codegen; SQL registration answers") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(unhex(hex(col("text"))).as("b"))
    val plan = docs.select(Utf8Stats(col("b")).as("st"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT utf8_stats(unhex('61C2A3')).n_chars").head().getLong(0)
    assert(viaSql == 2L)
  }
}
