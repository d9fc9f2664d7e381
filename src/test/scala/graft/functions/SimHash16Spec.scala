package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Native simhash must be bit-identical to the interpreted HOF vote chain
  * on real documents, and codegen'd.
  */
class SimHash16Spec extends SparkSpec {

  test("native equals HOF chain on the documents table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bad = docs.select(
        Dedup.simhash(col("text")).as("native"),
        Dedup.simhashHof(col("text")).as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(bad === 0L)
  }

  test("edge shapes: empty string, single token, repeated shingles") {
    import spark.implicits._
    val df = Seq("", "one", "a b c a b c a b c", "x y z").toDF("text")
    val got = df.select(
      Dedup.simhash(col("text")).as("native"),
      Dedup.simhashHof(col("text")).as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // 16-bit range
    got.foreach(r => assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 16)))
  }

  test("stays inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = docs.select(SimHash16(TextFunctions.shingleSet(col("text"), 3)).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
  }
}
