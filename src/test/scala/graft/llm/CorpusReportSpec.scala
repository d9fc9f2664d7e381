package graft.llm

import graft.SparkSpec

/** Data card: hand-checked metrics, NULL-text handling, empty corpus. */
class CorpusReportSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked card: dups, langs, token mass, NULL text") {
    val docs = Seq(
      (1L, Option("a b c"), "en"),   // 3 tokens
      (2L, Option("a b c"), "fr"),   // exact dup of 1
      (3L, Option("x y"), "en"),     // 2 tokens
      (4L, Option.empty[String], "de") // NULL text: 0 tokens, no fingerprint
    ).toDF("doc_id", "text", "lang")
    val card = CorpusReport.dataCard(docs).as[(String, Long)].collect().toMap
    assert(card("n_docs") === 4L)
    assert(card("total_tokens") === 8L) // 3 + 3 (dup counts) + 2 + 0
    assert(card("mean_tokens_milli") === 2000L) // 8000/4
    assert(card("n_langs") === 3L)
    assert(card("n_distinct_texts") === 2L)
    // 3 non-NULL texts − 2 distinct: the NULL-text doc is missing data,
    // not a duplicate
    assert(card("n_exact_dup_rows") === 1L)
  }

  test("empty corpus yields a zeroed card, not NULLs") {
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val card = CorpusReport.dataCard(docs).as[(String, Long)].collect().toMap
    assert(card.values.forall(_ === 0L))
    assert(card.size === 6)
  }

  test("one corpus scan: a single aggregate feeds every metric") {
    val docs = Seq((1L, "a", "en")).toDF("doc_id", "text", "lang")
    val plan = CorpusReport.dataCard(docs).queryExecution.executedPlan.toString
    // the multi-distinct rewrite expands within ONE aggregate chain —
    // no join of separate scans
    assert(!plan.contains("Join"))
  }
}
