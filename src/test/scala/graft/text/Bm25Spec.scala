package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-exact BM25: hand-computed scores on a tiny corpus, ranking
  * sanity, partitioning independence, and the scan-stage query filter
  * (the property that keeps the shuffle proportional to hits).
  */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),       // dl 3, tf(apple)=2
    (2L, "apple cherry"),             // dl 2
    (3L, "banana banana banana date"),// dl 4
    (4L, "cherry date elder fig")     // dl 4
  ).toDF("doc_id", "text")

  /** Reference implementation in plain Scala over the same integer forms. */
  private def expected(query: Seq[String]): Map[Long, Long] = {
    val docs = Map(
      1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("apple", "cherry"),
      3L -> Seq("banana", "banana", "banana", "date"),
      4L -> Seq("cherry", "date", "elder", "fig"))
    val nDocs = docs.size.toLong
    val totLen = docs.values.map(_.size.toLong).sum
    val dfs = query.map(t => t -> docs.values.count(_.contains(t)).toLong).toMap
    docs.flatMap { case (id, toks) =>
      val dl = toks.size.toLong
      val parts = query.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idfQ = math.floor(Bm25.Scale.toDouble *
            math.log((nDocs - dfs(t) + 0.5) / (dfs(t) + 0.5))).toLong
          val tfQ = (22L * tf * totLen * Bm25.Scale) /
            (10L * tf * totLen + 3L * totLen + 9L * dl * nDocs)
          Some(idfQ * tfQ)
        }
      }
      if (parts.isEmpty) None else Some(id -> parts.sum)
    }
  }

  test("matches the hand-rolled integer reference, any partitioning") {
    val query = Seq("apple", "banana", "elder")
    for (parts <- Seq(1, 5)) {
      val got = Bm25.score(corpus.repartition(parts), "doc_id", "text", query)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expected(query), s"partitioning $parts")
    }
  }

  test("docs without any query term are absent; hit counts are per-term") {
    val got = Bm25.score(corpus, "doc_id", "text", Seq("apple"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === 1L) // one DISTINCT matched term, tf folded into score
  }

  test("rarer term outranks a common one at equal tf and dl") {
    // 'elder' df=1 vs 'cherry' df=2; same tf=1, same dl docs
    val q = Seq("cherry", "elder")
    val got = Bm25.score(corpus, "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 4 holds both (higher score); doc 2 holds only cherry
    assert(got(4L) > got(2L))
  }

  test("stopword-like term gets negative idf, consistently on both paths") {
    // term in 3 of 4 docs: idf = ln(1.5/3.5) < 0
    val many = Seq((1L, "x a"), (2L, "x b"), (3L, "x c"), (4L, "y d"))
      .toDF("doc_id", "text")
    val got = Bm25.score(many, "doc_id", "text", Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got.values.forall(_ < 0L))
  }

  test("plan: query filter reaches below the tf shuffle") {
    val plan = Bm25.score(corpus, "doc_id", "text", Seq("apple"))
      .queryExecution.executedPlan.toString
    // the isin filter must appear (scan-stage hit filtering), and the
    // aggregate after the explode only sees filtered rows
    assert(plan.contains("apple"), plan.take(2000))
  }
}
