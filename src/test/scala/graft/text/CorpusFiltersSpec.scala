package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Local semantics for the corpus-preparation filters; the gate queries
  * (q_pii_scrub, q_train_split, q_repetition, q_text_normalize) pin the
  * cross-engine differential at sf scale.
  */
class CorpusFiltersSpec extends SparkSpec {

  test("scrubPii masks urls, emails, and phone runs in contract order") {
    import spark.implicits._
    val got = Seq(
      "see https://ex.org/a?q=1 or mail bob.smith+x@corp.example.co uk",
      "call +1 (415) 555-0123 now",
      "userinfo url http://a@b.example.com/path stays one URL",
      "no pii here at all"
    ).toDF("t").select(CorpusFilters.scrubPii(col("t"))).collect().map(_.getString(0))
    assert(got(0) == "see <URL> or mail <EMAIL> uk")
    assert(got(1) == "call <PHONE> now")
    assert(got(2) == "userinfo url <URL> stays one URL")
    assert(got(3) == "no pii here at all")
  }

  test("pii counts measure the raw text") {
    import spark.implicits._
    val r = Seq("a@b.co and c@d.org via https://x.y call +1 (415) 555-0123")
      .toDF("t")
      .select(CorpusFilters.nEmails(col("t")), CorpusFilters.nUrls(col("t")),
        CorpusFilters.nPhones(col("t")))
      .head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 1)))
  }

  test("normalizeText lowers, collapses whitespace, trims") {
    import spark.implicits._
    val got = Seq("  Hello   WORLD\t \n x ").toDF("t")
      .select(CorpusFilters.normalizeText(col("t"))).head().getString(0)
    assert(got == "hello world x")
  }

  test("splitAssign is deterministic, content-keyed, and ~trainPct heavy") {
    import spark.implicits._
    val docs = (0 until 400).map(i => s"document number $i body").toDF("t")
    val assigned = docs.select(col("t"), CorpusFilters.splitAssign(col("t"), 95).as("s"))
    val byRun2 = docs.select(col("t"), CorpusFilters.splitAssign(col("t"), 95).as("s"))
    assert(assigned.collect().toSet == byRun2.collect().toSet) // re-run stable
    val trainN = assigned.where(col("s") === "train").count()
    assert(trainN > 340 && trainN < 400) // ~95% of 400, loose bound
    // bucket is a pure content hash: permuting row order can't move a doc
    val bucketOf = docs.orderBy(col("t").desc)
      .select(col("t"), CorpusFilters.splitBucket(col("t"), 100).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketOrig = docs
      .select(col("t"), CorpusFilters.splitBucket(col("t"), 100).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketOf == bucketOrig)
  }

  test("stratifiedSample keeps per-stratum rates, content-keyed and monotone") {
    import spark.implicits._
    val docs = (0 until 400).map(i => (i.toLong, s"document body number $i", if (i % 2 == 0) "en" else "de"))
      .toDF("id", "text", "lang")
    val keep60_10 = CorpusFilters.stratifiedSample(docs, col("text"), col("lang"),
      Seq("en" -> 60), defaultPct = 10).select("id").as[Long].collect().toSet
    val keep90_30 = CorpusFilters.stratifiedSample(docs, col("text"), col("lang"),
      Seq("en" -> 90), defaultPct = 30).select("id").as[Long].collect().toSet
    // raising every rate only ADDS documents (hash-bucket threshold semantics)
    assert(keep60_10.subsetOf(keep90_30))
    // deterministic across invocations
    val again = CorpusFilters.stratifiedSample(docs, col("text"), col("lang"),
      Seq("en" -> 60), defaultPct = 10).select("id").as[Long].collect().toSet
    assert(again == keep60_10)
    // per-stratum acceptance tracks the requested share (±20% slack at n=200)
    val en = keep60_10.count(_ % 2 == 0) / 200.0
    val de = keep60_10.count(_ % 2 == 1) / 200.0
    assert(en > 0.4 && en < 0.8, s"en rate $en")
    assert(de > 0.02 && de < 0.25, s"de rate $de")
  }

  test("repetitionStats: bigram totals, top count, duplicate occupancy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),          // bigrams: [a b, b a, a b, b a] all repeats
      (2L, "w x y z"),            // bigrams: [w x, x y, y z] all unique
      (3L, "solo")                // short doc -> single whole-text gram
    ).toDF("doc_id", "text")
    val r = CorpusFilters.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(r(1L) == ((4L, 2L, 4L, 1.0)))
    assert(r(2L) == ((3L, 1L, 0L, 0.0)))
    assert(r(3L) == ((1L, 1L, 0L, 0.0)))
  }

  test("buildVocab: frequency order with deterministic text tiebreak") {
    import spark.implicits._
    val docs = Seq((1L, "b b b a a c c z"), (2L, "a z")).toDF("doc_id", "text")
    // counts: a=3, b=3, c=2, z=2 → top-3 = b? no: ties break by TOKEN asc
    assert(CorpusFilters.buildVocab(docs, "text", 3) === Seq("a", "b", "c"))
  }

  test("oovStats counts tokens outside the vocab") {
    import spark.implicits._
    val docs = Seq((1L, "a b q r"), (2L, "a a a")).toDF("doc_id", "text")
    val got = CorpusFilters.oovStats(docs, "doc_id", "text", Seq("a", "b"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 4L, 2L, 0.5), (2L, 3L, 0L, 0.0)))
  }

  test("sampleNPerGroup: window-form equality, partitioning independence, fixed size") {
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions.hash60
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy((hash60(col("text")) % (1L << 53)).asc, col("doc_id").asc)
    val expected = docs
      .withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= 3)
      .select("lang", "rank", "doc_id").orderBy("lang", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    for (parts <- Seq(1, 5)) {
      val got = CorpusFilters.sampleNPerGroup(
          docs.repartition(parts), Seq("lang"), col("text"), col("doc_id"), n = 3)
        .select("lang", "rank", "id").orderBy("lang", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === expected, s"parts=$parts")
      assert(got.groupBy(_._1).forall(_._2.size == 3))
    }
  }

  test("sampleN: global hash-rank sample, nested prefix, partitioning independence") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame, n: Int) =
      CorpusFilters.sampleN(df, col("text"), col("doc_id"), n)
        .orderBy("rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val s10 = run(docs, 10)
    assert(s10.size === 10 && s10.map(_._1) === (1L to 10L))
    assert(run(docs.repartition(7), 10) === s10)
    // nested: a smaller sample is a prefix of a larger one
    assert(run(docs, 20).take(10) === s10)
    // plan: global TopK aggregate, no window
    val plan = CorpusFilters.sampleN(docs, col("text"), col("doc_id"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkbyscore"), s"expected global partial TopK in:\n$plan")
    assert(!plan.contains("WindowExec"), s"unexpected window in:\n$plan")
  }

  test("gopherFlags: each rule fires on its adversarial input; filter is the AND") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val good = (1 to 60).map(i => s"the word$i").mkString(" ") // 120 words, has stopwords, alpha
    val rows = Seq(
      (1L, good),                                             // passes everything
      (2L, "too short"),                                      // words_ok fails
      (3L, (1 to 60).map(_ => "a").mkString(" ")),            // mean_len_ok fails (mean 1)
      (4L, (1 to 60).map(_ => "the ####").mkString(" ")),     // symbol_ok fails
      (5L, (1 to 60).map(_ => "the 123 456").mkString(" ")),  // alpha_ok fails (1/3 alpha)
      (6L, (1 to 60).map(i => s"word$i").mkString(" "))       // stopword_ok fails
    ).toDF("doc_id", "text")
    val r = CorpusFilters.GopherRules(minWords = 50, maxWords = 500, minStopwords = 1)
    val got = CorpusFilters.gopherFlags(rows, "text", r)
      .select("doc_id", "words_ok", "mean_len_ok", "symbol_ok",
        "alpha_ok", "stopword_ok", "keep")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(2),
        x.getBoolean(3), x.getBoolean(4), x.getBoolean(5), x.getBoolean(6)))
    assert(got(0) === ((1L, true, true, true, true, true, true)))
    assert(!got(1)._2 && !got(1)._7, "short doc must fail words_ok")
    assert(got(2)._2 && !got(2)._3, "single-char words must fail mean_len_ok")
    assert(!got(3)._4, "hash-heavy doc must fail symbol_ok")
    assert(!got(4)._5, "digit-heavy doc must fail alpha_ok")
    assert(!got(5)._6, "no-stopword doc must fail stopword_ok")
    // filter form keeps exactly the all-true rows, original schema
    val kept = CorpusFilters.gopherFilter(rows, "text", r)
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("mixSources: per-source quotas, exclusion, and nested-subset monotonicity") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val quotas = Map("src0" -> 3, "src1" -> 1, "src3" -> 2)
    val got = CorpusFilters.mixSources(docs, "source", col("text"), col("doc_id"), quotas)
      .select("source", "rank", "id").orderBy("source", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // quota respected per source; unquoted sources absent
    val bySrc = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySrc.keySet === quotas.keySet.filter(s => bySrc.contains(s)))
    got.groupBy(_._1).foreach { case (s, rows) => assert(rows.size <= quotas(s), s) }
    // equals sampleNPerGroup at each source's own quota (nested-subset:
    // ranks don't depend on the quota)
    quotas.foreach { case (s, n) =>
      val solo = CorpusFilters.sampleNPerGroup(
          docs.where(col("source") === s), Seq("source"), col("text"), col("doc_id"), n)
        .select("source", "rank", "id").orderBy("rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got.filter(_._1 == s) === solo, s)
    }
    // a quota larger than the group emits the whole group
    val big = CorpusFilters.mixSources(docs, "source", col("text"), col("doc_id"),
      Map("src0" -> 100000))
    assert(big.count() === docs.where(col("source") === "src0").count())
  }

  test("assignShards is content-keyed and writeShards materializes deterministic shards") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = CorpusFilters.assignShards(docs, col("text"), nShards = 8)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a.values.toSet.subsetOf((0 until 8).toSet))
    // partitioning-independent: same assignment from any layout
    val b = CorpusFilters.assignShards(docs.repartition(7), col("text"), nShards = 8)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a === b)
    // materialized shards: hive layout, every doc in its assigned shard,
    // and a re-run reproduces identical per-shard id sequences
    def writeAndRead(dir: String): Map[Int, Seq[Long]] = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      CorpusFilters.writeShards(docs, col("text"), col("doc_id"), nShards = 8, dir)
      (0 until 8).flatMap { s =>
        val p = new java.io.File(s"$dir/shard=$s")
        if (!p.exists()) None
        else Some(s -> spark.read.parquet(p.toString)
          .select("doc_id").collect().map(_.getLong(0)).toSeq)
      }.toMap
    }
    val run1 = writeAndRead("/tmp/graft_shards_1")
    val run2 = writeAndRead("/tmp/graft_shards_2")
    assert(run1 === run2)
    run1.foreach { case (s, ids) => ids.foreach(id => assert(a(id) === s)) }
    assert(run1.values.map(_.size).sum === docs.count())
  }
}
