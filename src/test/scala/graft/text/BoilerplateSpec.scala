package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Boilerplate removal contracts: the distinct-doc rule (within-doc
  * repetition never triggers it), group scoping, all-copies removal,
  * emptied-row retention, and the partial-agg/no-window plan shape.
  */
class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], minDocs: Long = 2) =
    Boilerplate.removeFrequentLines(
        rows.toDF("doc_id", "src", "text"), "doc_id", "text", "src", minDocs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

  test("a line in >= minDocs distinct docs of a group is removed EVERYWHERE") {
    val got = run(Seq(
      (1L, "a", "cookie banner\npage one body"),
      (2L, "a", "cookie banner\npage two body"),
      (3L, "a", "page three body\ncookie banner")))
    assert(got == Map(
      1L -> "page one body",
      2L -> "page two body",
      3L -> "page three body"))
  }

  test("within-document repetition alone does not trigger removal") {
    val got = run(Seq(
      (1L, "a", "la la\nla la\nla la"),
      (2L, "a", "other text")))
    assert(got(1L) == "la la\nla la\nla la") // 3 copies, but 1 distinct doc
  }

  test("the rule is group-scoped: the same line in another group survives") {
    val got = run(Seq(
      (1L, "a", "footer\nbody one"),
      (2L, "a", "footer\nbody two"),
      (3L, "b", "footer\nbody three")))
    assert(got(1L) == "body one" && got(2L) == "body two")
    assert(got(3L) == "footer\nbody three")
  }

  test("an all-boilerplate document keeps its row with empty text") {
    val got = run(Seq(
      (1L, "a", "footer"),
      (2L, "a", "footer"),
      (3L, "a", "footer\nreal content")))
    assert(got == Map(1L -> "", 2L -> "", 3L -> "real content"))
  }

  test("frequentLines audit names exactly the removable lines with doc counts") {
    val d = Seq(
      (1L, "a", "footer\nx"), (2L, "a", "footer\ny"), (3L, "b", "footer\nz"))
      .toDF("doc_id", "src", "text")
    val got = Boilerplate.frequentLines(d, "doc_id", "text", "src", minDocs = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "footer", 2L)))
  }

  test("result is independent of input partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("text", regexp_replace(col("text"), " (\\w+ \\w+ \\w+ \\w+) ", " $1\n"))
    def m(df: org.apache.spark.sql.DataFrame) =
      Boilerplate.removeFrequentLines(df, "doc_id", "text", "source", minDocs = 2)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(docs.repartition(7)) == m(docs.repartition(2)))
  }

  test("plan: no window, no cartesian; rule aggregate is partial-agg'd") {
    val d = Seq((1L, "a", "x\ny")).toDF("doc_id", "src", "text")
    val plan = Boilerplate.removeFrequentLines(d, "doc_id", "text", "src", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("partial_count"), plan)
  }
}
