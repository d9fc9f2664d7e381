package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Novelty contracts: hand-checked known/novel gram counts, all-known and
  * all-novel extremes, short-doc fallback gram, and the broadcast plan.
  */
class NoveltySpec extends SparkSpec {

  import spark.implicits._

  private val ref = Seq((100L, "a b c d e")).toDF("rid", "rtext")

  private def run(rows: (Long, String)*) =
    Novelty.noveltyScores(rows.toSeq.toDF("doc_id", "text"), ref,
        "doc_id", "text", "rtext", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("hand-checked: partial overlap scores the novel fraction") {
    // ref trigrams: {abc, bcd, cde}; doc "a b c d x": {abc, bcd, cdx}
    // -> 3 grams, 2 known, novelty 1/3
    val got = run(1L -> "a b c d x")
    assert(got(1L) == ((3L, 2L, 333333L)))
  }

  test("a doc fully inside the reference has novelty 0; disjoint has SCALE") {
    val got = run(1L -> "a b c d e", 2L -> "q w e r t")
    assert(got(1L) == ((3L, 3L, 0L)))
    assert(got(2L) == ((3L, 0L, 1000000L)))
  }

  test("within-doc gram repetition counts once (distinct grams)") {
    val got = run(1L -> "a b c a b c")
    // distinct trigrams of [a b c a b c]: abc bca cab abc -> {abc, bca, cab}
    assert(got(1L)._1 == 3L)
  }

  test("short docs contribute their whole text as one gram") {
    val got = run(1L -> "a b", 2L -> "q z")
    assert(got(1L) == ((1L, 0L, 1000000L))) // "a b" not a ref trigram
    assert(got(2L) == ((1L, 0L, 1000000L)))
  }

  test("plan: reference set broadcasts; no corpus-side extra shuffle") {
    val plan = Novelty.noveltyScores(
        Seq((1L, "a b c")).toDF("doc_id", "text"), ref, "doc_id", "text", "rtext")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
