package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Native minhash must be element-identical to the interpreted HOF chain,
  * and the band-key packing over it must match packing over the HOF
  * signature.
  */
class MinHashKSpec extends SparkSpec {

  test("native equals HOF signature on the documents table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bad = docs.select(
        Dedup.minhashSignature(col("text"), 3, 8).as("native"),
        Dedup.minhashSignatureHof(col("text"), 3, 8).as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(bad === 0L)
  }

  test("edge shapes: empty, single token, heavy repetition") {
    import spark.implicits._
    val df = Seq("", "tok", "r r r r r r r r", "a b c d e f g").toDF("text")
    val got = df.select(
      Dedup.minhashSignature(col("text"), 3, 8).as("n"),
      Dedup.minhashSignatureHof(col("text"), 3, 8).as("h")).collect()
    got.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("band keys over native signature match packing of the HOF signature") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val P = TextFunctions.P
    val hofPacked = docs.select(col("doc_id"),
        Dedup.minhashSignatureHof(col("text"), 3, 8).as("sig"))
      .select(col("doc_id"), array((0 until 4).map { j =>
        (0 until 2).map(r => element_at(col("sig"), j * 2 + r + 1))
          .reduceLeft((a, m) => a * P + m)
      }: _*).as("bk"))
    val native = docs.select(col("doc_id"),
      Dedup.bandKeys(col("text"), 3, 4, 2).as("bk"))
    val joined = native.as("n").join(hofPacked.as("h"), "doc_id")
      .where(col("n.bk") =!= col("h.bk"))
    assert(joined.count() === 0L)
  }

  test("stays inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = docs.select(Dedup.bandKeys(col("text"), 3, 4, 2).as("bk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
  }
}
