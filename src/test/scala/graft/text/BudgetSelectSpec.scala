package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-budget selection: hand-checked cuts, boundary inclusion, bucket-
  * width independence (the two-level decomposition is the plain running
  * sum), partitioning independence, the integral-score guard, and the
  * no-global-window plan shape.
  */
class BudgetSelectSpec extends SparkSpec {

  import spark.implicits._

  // (id, score, ntok): total order by (score, id) is 4, 2, 1, 3 with
  // running totals 10, 30, 60, 100
  private def docs = Seq(
    (1L, 7L, 30L),
    (2L, 5L, 20L),
    (3L, 9L, 40L),
    (4L, 2L, 10L)).toDF("id", "score", "ntok")

  private def run(budget: Long, width: Long = 1000L) =
    BudgetSelect.selectWithinBudget(docs, "id", "score", col("ntok"), budget, width)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("keeps best-scoring docs while the inclusive running total fits") {
    assert(run(60) === Seq((1L, 7L, 30L, 60L), (2L, 5L, 20L, 30L), (4L, 2L, 10L, 10L)))
    assert(run(59) === Seq((2L, 5L, 20L, 30L), (4L, 2L, 10L, 10L)))
  }

  test("boundary: a doc landing exactly on the budget is kept") {
    assert(run(10) === Seq((4L, 2L, 10L, 10L)))
    assert(run(9) === Seq.empty)
    assert(run(100) === Seq((1L, 7L, 30L, 60L), (2L, 5L, 20L, 30L),
      (3L, 9L, 40L, 100L), (4L, 2L, 10L, 10L)))
  }

  test("bucket-width independent: any coarse level gives the same cut") {
    val widths = Seq(1L, 3L, 7L, 1000L)
    val expected = run(60, 1000L)
    widths.foreach(w => assert(run(60, w) === expected, s"width $w"))
  }

  test("negative scores stay in total order across buckets") {
    val neg = Seq((1L, -12L, 5L), (2L, -3L, 5L), (3L, 4L, 5L)).toDF("id", "score", "ntok")
    val got = BudgetSelect.selectWithinBudget(neg, "id", "score", col("ntok"), 10L, 5L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, -12L, 5L, 5L), (2L, -3L, 5L, 10L)))
  }

  test("score ties break by id: the lower id fills the budget first") {
    val tied = Seq((10L, 1L, 6L), (2L, 1L, 6L)).toDF("id", "score", "ntok")
    val got = BudgetSelect.selectWithinBudget(tied, "id", "score", col("ntok"), 6L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((2L, 1L, 6L, 6L)))
  }

  test("duplicate (score, id) rows: ROWS frame cuts one, not both-or-neither") {
    // RANGE-frame ties would give BOTH rows cum=12 and cut both
    val dup = Seq((7L, 3L, 6L), (7L, 3L, 6L)).toDF("id", "score", "ntok")
    val got = BudgetSelect.selectWithinBudget(dup, "id", "score", col("ntok"), 6L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((7L, 3L, 6L, 6L)))
  }

  test("NULL id / score / group rows are excluded, matching the oracle") {
    val d = Seq(
      (Some(1L), Option("en"), Some(1L), 5L), // valid
      (None, Option("en"), Some(1L), 5L),     // NULL id
      (Some(3L), Option.empty[String], Some(1L), 5L), // NULL group
      (Some(4L), Option("en"), Option.empty[Long], 5L) // NULL score
    ).toDF("id", "grp", "score", "ntok")
    val flat = BudgetSelect.selectWithinBudget(d, "id", "score", col("ntok"), 100L)
      .select("id").as[Long].collect().toSet
    assert(flat === Set(1L, 3L)) // group is irrelevant to the flat cut
    val grouped = BudgetSelect.capPerGroup(d, "id", "grp", "score", col("ntok"), 100L)
      .select("id").as[Long].collect().toSet
    assert(grouped === Set(1L))
  }

  test("fractional score column is rejected") {
    val frac = Seq((1L, 1.5, 3L)).toDF("id", "score", "ntok")
    val e = intercept[IllegalArgumentException] {
      BudgetSelect.selectWithinBudget(frac, "id", "score", col("ntok"), 10L)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("partitioning-independent") {
    val many = (1 to 200).map(i =>
      (i.toLong, ((i * 37) % 50).toLong, ((i % 7) + 1).toLong))
      .toDF("id", "score", "ntok")
    def cut(df: org.apache.spark.sql.DataFrame) =
      BudgetSelect.selectWithinBudget(df, "id", "score", col("ntok"), 300L, 13L)
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(cut(many.coalesce(1)) === cut(many.repartition(8)))
  }

  test("plan: corpus window is bucket-partitioned, offsets broadcast back") {
    val plan = BudgetSelect.selectWithinBudget(docs, "id", "score", col("ntok"), 60L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // the row-level window runs partitioned by the coarse bucket; the only
    // unpartitioned window is over the bucket-totals aggregate
    assert(plan.contains("windowspecdefinition(__bucket"))
  }

  test("capPerGroup: each group's cut is independent") {
    val d = Seq(
      (1L, "en", 1L, 6L), (2L, "en", 2L, 6L), (3L, "en", 3L, 6L),
      (4L, "fr", 9L, 10L), (5L, "fr", 1L, 3L)).toDF("id", "grp", "score", "ntok")
    val got = BudgetSelect.capPerGroup(d, "id", "grp", "score", col("ntok"), 12L)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // en: 6, 12 fit, 18 is over the cap; fr: 3 fits, then 3+10=13 is over
    assert(got === Seq(
      (1L, "en", 1L, 6L, 6L), (2L, "en", 2L, 6L, 12L), (5L, "fr", 1L, 3L, 3L)))
  }

  test("capPerGroup: bucket-width and partitioning independent") {
    val many = (1 to 300).map(i =>
      (i.toLong, s"g${i % 5}", ((i * 41) % 60).toLong, ((i % 9) + 1).toLong))
      .toDF("id", "grp", "score", "ntok")
    def cut(df: org.apache.spark.sql.DataFrame, w: Long) =
      BudgetSelect.capPerGroup(df, "id", "grp", "score", col("ntok"), 80L, w)
        .as[(Long, String, Long, Long, Long)].collect().toSet
    val expected = cut(many, 1000L)
    assert(cut(many, 7L) === expected)
    assert(cut(many.repartition(8), 13L) === expected)
    assert(cut(many.coalesce(1), 1000L) === expected)
  }

  test("capPerGroup plan: every window is partitioned (no global funnel)") {
    val d = Seq((1L, "en", 1L, 6L)).toDF("id", "grp", "score", "ntok")
    val plan = BudgetSelect.capPerGroup(d, "id", "grp", "score", col("ntok"), 12L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__grp"))
    assert(!plan.contains("windowspecdefinition(__bucket#")
      || plan.contains("windowspecdefinition(__grp"))
  }

  test("mixByWeights: integer budget split, unweighted domains excluded") {
    val d = Seq(
      (1L, "en", 1L, 4L), (2L, "en", 2L, 4L), (3L, "en", 3L, 4L),
      (4L, "fr", 1L, 3L), (5L, "fr", 2L, 3L),
      (6L, "es", 1L, 9L)).toDF("id", "grp", "score", "ntok")
    // total 10 → en ⌊10·800/1000⌋ = 8 (keeps two 4s), fr ⌊10·300/1000⌋ = 3
    // (keeps one 3), es unweighted → excluded
    val got = BudgetSelect.mixByWeights(d, "id", "grp", "score", col("ntok"),
        Map("en" -> 800L, "fr" -> 300L), totalBudget = 10L)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 4L))
  }

  test("mixByWeights: zero-budget weights are rejected up front") {
    val d = Seq((1L, "en", 1L, 4L)).toDF("id", "grp", "score", "ntok")
    val e = intercept[IllegalArgumentException] {
      BudgetSelect.mixByWeights(d, "id", "grp", "score", col("ntok"),
        Map("en" -> 1L), totalBudget = 100L) // ⌊100/1000⌋ = 0
    }
    assert(e.getMessage.contains("positive token budget"))
  }

  test("LM composition: cut ranks by mean NLL and replays the window oracle") {
    val corpus = Seq(
      (1L, "a a a a"),       // all top-vocab → lowest mean NLL
      (2L, "a b a b"),
      (3L, "q r s t")        // all OOV-ish singletons → highest
    ).toDF("doc_id", "text")
    val got = BudgetSelect.selectByLmScore(corpus, vocabSize = 2, budget = 8L)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L)) // 4 + 4 tokens fill the budget; doc 3 is cut
  }
}
