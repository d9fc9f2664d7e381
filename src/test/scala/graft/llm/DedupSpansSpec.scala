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

  test("plan: no cartesian, occurrence rule partial-agg'd on the fingerprint, no window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Dedup.dedupSpans(docs, n = 4, minCount = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("hashpartitioning(__bh"), plan)
    // mass-duplication posture: the occurrence rule must map-side combine
    // (partial min/count per fingerprint), never window-sort the group
    assert(plan.contains("partial_min") || plan.contains("partial min"), plan)
    assert(!plan.contains("WindowExec"), plan)
  }

  test("one span duplicated far beyond partition size still dedups (whale fingerprint)") {
    import spark.implicits._
    // 20k copies of one 4-token span across 4 partitions — each copy is a
    // whole document, plus one unique doc; partial agg must collapse the
    // duplicate fingerprint map-side rather than buffer 20k rows in one task
    val whale = (1L to 20000L).map(i => (i, "dup dup dup dup")) :+ (30000L, "u n i q")
    val got = Dedup.dedupSpans(whale.toDF("doc_id", "text").repartition(4), n = 4, minCount = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 20001)
    assert(got(1L) == "dup dup dup dup") // first occurrence survives
    assert(got(2L) == "" && got(20000L) == "")
    assert(got(30000L) == "u n i q")
  }
}
