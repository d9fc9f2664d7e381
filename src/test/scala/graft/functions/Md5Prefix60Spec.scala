package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Native hash must agree exactly with the portable SQL chain it replaces
  * (and with DuckDB's CAST('0x'||substr(md5(x),1,15) AS BIGINT) — pinned by
  * the correctness gate).
  */
class Md5Prefix60Spec extends SparkSpec {
  import spark.implicits._

  test("equals conv(substring(md5,1,15),16,10) on varied inputs, null-safe") {
    val data = Seq("hello", "", "a b c", "ünïcodé ⚡", "x" * 10000, null)
      .toDF("s").repartition(3)
    val both = data.select(
      Md5Prefix60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast(LongType).as("chain"))
    both.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r.toString)
    }
  }

  test("known value: md5('hello') prefix") {
    val v = Seq("hello").toDF("s").select(Md5Prefix60(col("s"))).head().getLong(0)
    assert(v == 419982666956583591L) // 0x5d41402abc4b2a7
  }

  test("participates in whole-stage codegen in a plain projection") {
    val df = spark.range(100).select(Md5Prefix60(col("id").cast("string")).as("h"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(df.distinct().count() == 100)
  }
}
