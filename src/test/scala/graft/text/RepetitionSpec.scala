package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Repetition-metric contracts: hand-checked counts, short-text edges,
  * the no-shingle-fallback gram contract, and the zero-shuffle plan.
  */
class RepetitionSpec extends SparkSpec {

  import spark.implicits._

  private def m(rows: (Long, String)*) =
    Repetition.metrics(rows.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("hand-checked: looped sentence counts duplicated grams") {
    // "a b c a b c a b" : 8 tokens; top word a=3;
    // bigrams: ab bc ca ab bc ca ab -> 7 total, 3 distinct -> 4 dup
    // trigrams: abc bca cab abc bca cab -> 6 total, 3 distinct -> 3 dup
    val got = m(1L -> "a b c a b c a b")
    assert(got(1L) == ((8L, 3L, 4L, 3L)))
  }

  test("all-unique text has zero duplicated grams") {
    val got = m(1L -> "q w e r t y")
    assert(got(1L) == ((6L, 1L, 0L, 0L)))
  }

  test("one hammered word: top count is the token count") {
    // 3 bigram occurrences of one distinct bigram -> 2 dups; 2 trigrams -> 1
    val got = m(1L -> "spam spam spam spam")
    assert(got(1L) == ((4L, 4L, 2L, 1L)))
  }

  test("short texts: below n tokens means no n-grams (no shingle fallback)") {
    val got = m(1L -> "solo", 2L -> "two words")
    assert(got(1L) == ((1L, 1L, 0L, 0L)))
    assert(got(2L) == ((2L, 1L, 1L - 1L, 0L))) // 1 bigram, distinct -> 0 dup
  }

  test("NULL text rows drop; results partition-independent") {
    val df = Seq((1L, "a a"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Repetition.metrics(df, "doc_id", "text").collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def r(d: org.apache.spark.sql.DataFrame) =
      Repetition.metrics(d, "doc_id", "text").collect()
        .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(docs.repartition(7)) == r(docs.repartition(2)))
  }

  test("plan: pure scan stage — zero exchanges") {
    val plan = Repetition.metrics(
        Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
