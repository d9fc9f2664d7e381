package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inverted-index contracts: hand-checked postings, bounded whale-term
  * lists with honest df, partitioning independence, and the partial-agg
  * plan shape.
  */
class InvertedIndexSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (3L, "b a a c"),
      (1L, "a b"),
      (2L, "a x"),
      (4L, "")
    ).toDF("doc_id", "text")
  }

  test("hand-checked: distinct per doc, df exact, postings ascending") {
    val out = InvertedIndex.build(docsDf, "doc_id", "text", 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(out == Map(
      "a" -> ((3L, Seq(1L, 2L, 3L))),
      "b" -> ((2L, Seq(1L, 3L))),
      "c" -> ((1L, Seq(3L))),
      "x" -> ((1L, Seq(2L))),
      ""  -> ((1L, Seq(4L)))))
  }

  test("whale term: postings capped, df counts everything") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, s"the w$i")).toDF("doc_id", "text")
    val the = InvertedIndex.build(docs, "doc_id", "text", 8)
      .where(col("term") === "the").head
    assert(the.getLong(1) == 500L && the.getSeq[Long](2) == (1L to 8L))
  }

  test("flat form matches build; invariant under input partitioning") {
    val a = InvertedIndex.buildFlat(docsDf.repartition(7), "doc_id", "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = InvertedIndex.buildFlat(docsDf.coalesce(1), "doc_id", "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
    assert(a.contains(("a", 3L, 1L, 1L)) && a.contains(("a", 3L, 2L, 2L)) &&
      !a.exists(t => t._1 == "a" && t._3 == 3L), "cap at 2 postings")
  }

  test("plan: partial aggregation, no shuffle-wide distinct") {
    val plan = InvertedIndex.build(docsDf, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
    // the only exchange is the term aggregation (array_distinct is scan-stage)
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }
}
