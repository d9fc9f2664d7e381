package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (1L, "the secret benchmark question about turtles and rivers")
  ).toDF("doc_id", "text")

  private val corpus = Seq(
    (10L, "an innocent document about cooking pasta with tomatoes"),
    (11L, "this copies the secret benchmark question about turtles and rivers verbatim"),
    (12L, "mentions turtles and rivers but with no five gram overlap here"),
    (13L, "another clean doc that shares nothing with the eval set at all")
  ).toDF("doc_id", "text")

  test("flag marks exactly the docs sharing an n-gram with the benchmark") {
    val flagged = Decontaminate.flag(corpus, "doc_id", "text", bench, n = 5)
      .select("doc_id", "n_overlap", "contaminated").orderBy("doc_id").collect()
    val byId = flagged.map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(byId(11L)._2, "verbatim copier must be contaminated")
    assert(byId(11L)._1 >= 4, "a 12-token overlap span carries several 5-grams")
    assert(!byId(10L)._2 && byId(10L)._1 === 0)
    assert(!byId(12L)._2, "shared words without a shared 5-gram are clean")
    assert(!byId(13L)._2)
  }

  test("clean drops flagged docs and keeps the rest intact") {
    val cleaned = Decontaminate.clean(corpus, "doc_id", "text", bench, n = 5)
    assert(cleaned.select("doc_id").as[Long].collect().sorted === Seq(10L, 12L, 13L))
    assert(cleaned.columns.toSeq === corpus.columns.toSeq)
  }

  test("minOverlap thresholds the flag") {
    val strict = Decontaminate.flag(corpus, "doc_id", "text", bench, n = 5, minOverlap = 100)
    assert(strict.where(col("contaminated")).count() === 0)
  }

  test("short benchmark docs (< n tokens) still contribute their whole text") {
    val tinyBench = Seq((1L, "tiny eval")).toDF("doc_id", "text")
    val c = Seq((20L, "prefix tiny eval suffix"), (21L, "tiny evaluation text")).toDF("doc_id", "text")
    // corpus doc 20 has 4 tokens < n ⇒ its single whole-text shingle is
    // "prefix tiny eval suffix", which differs from benchmark's "tiny eval"
    val flagged = Decontaminate.flag(c, "doc_id", "text", tinyBench, n = 5)
      .where(col("contaminated")).select("doc_id").as[Long].collect()
    assert(flagged.isEmpty)
    // with n = 2 the gram "tiny eval" is shared
    val flagged2 = Decontaminate.flag(c, "doc_id", "text", tinyBench, n = 2)
      .where(col("contaminated")).select("doc_id").as[Long].collect()
    assert(flagged2.toSeq === Seq(20L))
  }

  test("corpus-side plan broadcasts the benchmark gram set (no corpus shuffle before the match)") {
    val plan = Decontaminate.overlapCounts(corpus, "doc_id", "text", bench, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
