package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Script mix: golden counts per range-table arm, surrogate pairs,
  * empty/null, codegen pin.
  */
class ScriptMixSpec extends SparkSpec {

  import spark.implicits._

  private def mix(s: String): Map[String, Long] = {
    val r = Seq(s).toDF("t").select(ScriptMix(col("t")).as("m"))
      .select("m.*").collect().head
    r.schema.fieldNames.map(f => f -> r.getAs[Long](f)).toMap
  }

  test("ASCII splits into letter/digit/whitespace/punct") {
    val m = mix("Ab1 ,\t\n")
    assert(m("n_cp") == 7L)
    assert(m("ascii_letter") == 2L)
    assert(m("digit") == 1L)
    assert(m("whitespace") == 3L)
    assert(m("punct") == 1L)
    assert(m("other") == 0L)
  }

  test("each non-ASCII arm lands in its declared bucket") {
    assert(mix("é")("latin_ext") == 1L)     // U+00E9
    assert(mix("ʒ")("latin_ext") == 1L)     // U+0292 IPA
    assert(mix("жЖѐ")("cyrillic") == 3L)    // U+0436/U+0416/U+0450
    assert(mix("مض")("arabic") == 2L)
    assert(mix("文字")("cjk") == 2L)
    assert(mix("かカ")("cjk") == 2L)        // kana counts as cjk (declared)
    assert(mix("한글")("hangul") == 2L)
    assert(mix("∑")("other") == 1L)         // U+2211 math
    assert(mix("Ω")("other") == 1L)         // Greek is not a declared bucket
  }

  test("astral codepoints count once (surrogate pairs) and fall to other") {
    val m = mix("a😀b") // emoji U+1F600 between letters
    assert(m("n_cp") == 3L)
    assert(m("ascii_letter") == 2L)
    assert(m("other") == 1L)
  }

  test("empty string is all zeros; NULL stays NULL") {
    assert(mix("")("n_cp") == 0L)
    val r = Seq(Option.empty[String]).toDF("t")
      .select(ScriptMix(col("t")).as("m")).collect().head
    assert(r.isNullAt(0))
  }

  test("stays inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = docs.select(ScriptMix(col("text")).as("m"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
  }
}
