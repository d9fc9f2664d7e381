package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** NFC audit: composed vs decomposed forms, codepoint (not code-unit)
  * counting on astral chars, idempotence on clean text, NULLs,
  * codegen pin.
  */
class NfcStatsSpec extends SparkSpec {

  private def stats(s: String) = NfcStats.compute(UTF8String.fromString(s))

  test("NFD text is flagged and its composition delta counted") {
    val nfd = "cafe\u0301" // e + combining acute: 5 codepoints
    val r = stats(nfd)
    assert(!r.getBoolean(0) && r.getInt(1) == 5 && r.getInt(2) == 4)
  }

  test("NFC text passes with equal counts") {
    val r = stats("caf\u00e9")
    assert(r.getBoolean(0) && r.getInt(1) == 4 && r.getInt(2) == 4)
  }

  test("counts are codepoints: astral chars count once") {
    val r = stats("a😀b") // a, emoji (2 UTF-16 units), b
    assert(r.getInt(1) == 3 && r.getInt(2) == 3 && r.getBoolean(0))
  }

  test("ASCII and empty strings are trivially NFC") {
    assert(stats("hello world").getBoolean(0))
    val e = stats("")
    assert(e.getBoolean(0) && e.getInt(1) == 0)
  }

  test("NULL text is NULL; codegen span over a parquet scan") {
    assert(NfcStats.compute(null) == null)
    val out = spark.read.parquet(s"$sf/documents.parquet")
      .select(NfcStats(concat(col("text"), lit("é"))).as("m"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
    assert(!out.head().getStruct(0).getBoolean(0))
  }
}
