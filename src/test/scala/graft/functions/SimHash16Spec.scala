package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import graft.text.TextFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The compact 16-bit SimHash expression must stay bit-identical to the
  * interpreted HOF vote chain (spec-local — production [[graft.llm.Dedup]]
  * is 64-bit now) and codegen'd.
  */
class SimHash16Spec extends SparkSpec {

  /** 16-bit HOF reference: per shingle hashM (hash60 % M), ±1 vote per low
    * bit via modulus tests — the pre-native formulation, kept here as the
    * differential oracle for [[SimHash16]].
    */
  private def simhash16Hof(text: Column, shingleN: Int = 3): Column = {
    val bits = SimHash16.Bits
    val votes = (0 until bits).map { b =>
      (hv: Column) => when(hv % (1L << (b + 1)) >= (1L << b), lit(1L)).otherwise(lit(-1L))
    }
    aggregate(
      transform(shingleSet(text, shingleN), s => hashM(s)),
      array_repeat(lit(0L), bits),
      (acc, hv) => zip_with(acc, array(votes.map(v => v(hv)): _*), (a, x) => a + x),
      sums => (0 until bits)
        .map(b => when(element_at(sums, b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _))
  }

  private def native16(text: Column, shingleN: Int = 3): Column =
    SimHash16(shingleSet(text, shingleN))

  test("native equals HOF chain on the documents table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bad = docs.select(
        native16(col("text")).as("native"),
        simhash16Hof(col("text")).as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(bad === 0L)
  }

  test("edge shapes: empty string, single token, repeated shingles") {
    import spark.implicits._
    val df = Seq("", "one", "a b c a b c a b c", "x y z").toDF("text")
    val got = df.select(
      native16(col("text")).as("native"),
      simhash16Hof(col("text")).as("hof")).collect()
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
