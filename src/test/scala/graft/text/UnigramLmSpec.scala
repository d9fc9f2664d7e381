package graft.text

import graft.SparkSpec

/** Unigram LM scoring: hand-checked costs, OOV pricing, deterministic
  * top-V tie handling, cross-corpus scoring, partitioning independence,
  * and the broadcast-join / partial-agg plan shape.
  */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  // token counts: a=4, b=2, c=1, d=1 → total 8
  private def corpus = Seq(
    (1L, "a a b"),
    (2L, "a b c"),
    (3L, "a d")).toDF("doc_id", "text")

  private val Scale = 1000000L
  private def costQ(total: Long, cnt: Long): Long =
    math.floor(Scale.toDouble * math.log(total.toDouble / cnt.toDouble)).toLong

  test("train: counts, total, and (cnt desc, term asc) vocabulary order") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 10)
    assert(m.totalTokens === 8L)
    assert(m.vocab.toSeq === Seq(("a", 4L), ("b", 2L), ("c", 1L), ("d", 1L)))
  }

  test("top-V cut mid-tie is deterministic: term asc breaks the c/d tie") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 3)
    assert(m.vocab.toSeq === Seq(("a", 4L), ("b", 2L), ("c", 1L)))
  }

  test("scoreSelf: hand-computed quantized costs and OOV counts") {
    val rows = UnigramLm.scoreSelf(corpus, vocabSize = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // vocab = a:4, b:2, c:1 (d is OOV, priced at pseudo-count 1 — same
    // cost as c here, ln(8/1))
    val (ca, cb, c1) = (costQ(8, 4), costQ(8, 2), costQ(8, 1))
    assert(rows(0) === ((1L, 3L, 0L, 2 * ca + cb)))
    assert(rows(1) === ((2L, 3L, 0L, ca + cb + c1)))
    assert(rows(2) === ((3L, 2L, 1L, ca + c1)))
  }

  test("scoring a different corpus: unseen tokens priced at pseudo-count 1") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 10)
    val other = Seq((9L, "a z z")).toDF("doc_id", "text")
    val r = UnigramLm.scoreDocs(other, m).as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq((9L, 3L, 2L, costQ(8, 4) + 2 * costQ(8, 1))))
  }

  test("empty text is one empty token (split parity with the corpus family)") {
    val one = Seq((1L, "")).toDF("doc_id", "text")
    val m = UnigramLm.train(one, "text", vocabSize = 4)
    assert(m.totalTokens === 1L && m.vocab.toSeq === Seq(("", 1L)))
    val r = UnigramLm.scoreSelf(one, vocabSize = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq((1L, 1L, 0L, 0L))) // ln(1/1) = 0
  }

  test("partitioning-independent") {
    val docs = (1 to 80).map(i => (i.toLong, s"w${i % 11} w${i % 5} w${i % 3} shared"))
      .toDF("doc_id", "text")
    val a = UnigramLm.scoreSelf(docs.coalesce(1), vocabSize = 7)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = UnigramLm.scoreSelf(docs.repartition(8), vocabSize = 7)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("NULL-text rows are excluded from scoring (documented contract)") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 10)
    val withNull = Seq((1L, Option("a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val ids = UnigramLm.scoreDocs(withNull, m).select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  test("maintained count store folded over batches ≡ batch train") {
    import graft.operators.IncrementalAgg
    val dir = java.nio.file.Files.createTempDirectory("lm_store").toString
    val batches = Seq(corpus.where($"doc_id" === 1L), corpus.where($"doc_id" === 2L),
      corpus.where($"doc_id" === 3L))
    batches.foreach { b =>
      IncrementalAgg.update(spark, dir,
        b.select(org.apache.spark.sql.functions.explode(
          TextFunctions.tokens($"text")).as("term")),
        Seq("term"), Seq(IncrementalAgg.Count("cnt")))
    }
    val folded = UnigramLm.fromCounts(IncrementalAgg.read(spark, dir), vocabSize = 10)
    val batch = UnigramLm.train(corpus, "text", vocabSize = 10)
    assert(folded.totalTokens === batch.totalTokens)
    assert(folded.vocab.toSeq === batch.vocab.toSeq)
  }

  test("plan: vocab join broadcasts, per-doc sums partial-aggregate") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 3)
    val plan = UnigramLm.scoreDocs(corpus, m)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("train plan: top-V cut is TakeOrderedAndProject (bounded per partition)") {
    val counts = corpus
      .select(org.apache.spark.sql.functions.explode(
        TextFunctions.tokens(org.apache.spark.sql.functions.col("text"))).as("term"))
      .groupBy("term")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val cut = counts
      .orderBy(org.apache.spark.sql.functions.col("cnt").desc,
        org.apache.spark.sql.functions.col("term").asc)
      .limit(300)
    assert(cut.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }
}
