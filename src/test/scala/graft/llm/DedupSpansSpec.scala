package graft.llm

import graft.SparkSpec

/** Substring-dedup contracts: first occurrence survives, below-threshold
  * repeats stay, short remainder blocks, emptied-document row retention,
  * partitioning independence, and the no-cartesian plan shape.
  */
class DedupSpansSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], n: Int = 4, minCount: Long = 2): Map[Long, String] =
    Dedup.dedupSpans(rows.toDF("doc_id", "text"), n, minCount)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("a repeated block is removed everywhere except its first occurrence") {
    val got = run(Seq(
      1L -> "a b c d x y z w",
      2L -> "a b c d q r s t",
      3L -> "q r s t a b c d"))
    // "a b c d" first occurs at (1, 0); "q r s t" first at (2, 1)
    assert(got == Map(
      1L -> "a b c d x y z w",
      2L -> "q r s t",
      3L -> ""))
  }

  test("repeats below minCount survive") {
    val rows = Seq(1L -> "a b c d", 2L -> "a b c d")
    assert(run(rows, minCount = 3) == rows.toMap)
  }

  test("a trailing block shorter than n is a block of its own") {
    val got = run(Seq(1L -> "a b c d e f", 2L -> "e f"))
    // doc1 = ["a b c d", "e f"], doc2 = ["e f"]: the 2-token remainder
    // block matches doc2's whole text; first occurrence (1, 1) survives
    assert(got == Map(1L -> "a b c d e f", 2L -> ""))
  }

  test("a fully-boilerplate document keeps its row with empty text") {
    val got = run(Seq(1L -> "a b c d", 2L -> "a b c d", 3L -> "a b c d"))
    assert(got == Map(1L -> "a b c d", 2L -> "", 3L -> ""))
  }

  test("result is independent of input partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def m(df: org.apache.spark.sql.DataFrame) =
      Dedup.dedupSpans(df, n = 4, minCount = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(docs.repartition(7)) == m(docs.repartition(2)))
  }

  test("plan: no cartesian, occurrence shuffle keyed on the fingerprint") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Dedup.dedupSpans(docs, n = 4, minCount = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("hashpartitioning(__bh"), plan)
  }
}
