package graft

/** Physical-plan pins for the scale-critical queries: a plan regression (a
  * full sort where a TakeOrdered suffices, a lost parquet pushdown, a
  * broadcast that degrades to shuffle) changes these assertions before it
  * changes a benchmark.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_fabrix_slice plans as TakeOrderedAndProject with offset (no global sort)") {
    val p = planOf("q_fabrix_slice")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(p.contains("offset=100"), p.take(400))
    assert(!p.contains("Exchange rangepartitioning"), p.take(400))
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p.take(600))
    assert(p.contains("partial_sum"), p.take(600)) // two-phase agg (map-side combine)
  }

  test("q_groupby_join broadcasts the small dimension side") {
    val p = planOf("q_groupby_join")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("q1_agg scan is column-pruned to the referenced columns only") {
    val p = planOf("q1_agg")
    // 6 of lineitem's 16 columns; a scan reading all columns is a regression
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_shipdate") && !read.contains("l_comment"), read)
  }

  test("window queries plan ONE hash exchange per partition spec (rank+rn share it)") {
    // both window columns of q_window_rank use the same PARTITION BY/ORDER
    // BY, so Catalyst must collapse them into one Window operator over one
    // Exchange — two exchanges would double the shuffle at scale
    val p = planOf("q_window_rank")
    assert(p.linesIterator.count(_.contains("Window [")) == 1, p.take(800))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p.take(800))
  }

  test("q_window_moving: running frame stays in one Window pass, filter-free scan") {
    val p = planOf("q_window_moving")
    // the moving sum + count share the frame: one Window operator, not two
    assert(p.linesIterator.count(_.contains("Window [")) == 1, p.take(800))
    assert(p.contains("specifiedwindowframe(RowFrame, -2, currentrow$())"), p.take(800))
  }

  test("native embedding expressions stay inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // codegen'd operators print with a `*(n)` stage prefix; an expression
    // falling back to interpreted eval loses it — the corpus-wide pass
    // these expressions exist for would silently stop being fused
    def codegenLine(p: String, needle: String): Unit = {
      val line = p.linesIterator.find(_.contains(needle)).getOrElse(
        fail(s"$needle not in plan:\n${p.take(600)}"))
      assert(line.trim.startsWith("*"), s"$needle not codegen'd: $line")
    }
    val enc = graft.llm.ProductQuantizer
      .gridCodebook(m = 8, subDim = 8, ksub = 8, lo = -0.5, hi = 0.5)
      .encode(emb, "vec_id", "embedding")
    codegenLine(enc.queryExecution.executedPlan.toString, "pq_encode")
    val assign = emb.select(
      graft.functions.NearestCentroid(col("embedding"),
        Array(Array.fill(64)(0.0), Array.fill(64)(0.5))).as("list"))
    codegenLine(assign.queryExecution.executedPlan.toString, "nearest_centroid")
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.03)
    val probe = emb.select(
      graft.functions.BloomMightContain(col("vec_id"), bloom).as("hit"))
    codegenLine(probe.queryExecution.executedPlan.toString, "bloom_might_contain")
  }

  test("bloom dedup: only ONE store join, the negative branch bypasses it") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import graft.text.TextFunctions.fingerprint
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val store = docs.where(pmod(col("doc_id"), lit(7)) === 0)
      .select(fingerprint(col("text")).as("fp")).distinct()
    val p = graft.llm.Dedup
      .dedupIncrementalBloom(docs, store, "text", "doc_id", expectedStoreItems = 1024)
      .queryExecution.executedPlan.toString
    // one anti join (the verified branch); the bloom-negative branch must
    // reach the union join-free or the shuffle bypass is gone
    assert(p.linesIterator.count(_.contains("LeftAnti")) == 1, p.take(1200))
    assert(p.contains("Union"), p.take(1200))
  }

  test("ADT broadcastHint pins a BroadcastHashJoin even with auto-broadcast off") {
    import graft.adt._
    import graft.exec.Translator
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def run(hint: Boolean) = Translator.select(
        Select(
          table = "customer",
          columns = Seq(Col("c_custkey"), Col("n_name", Some("nation"))),
          joins = Seq(Join("nation", Seq(("c_nationkey", "n_nationkey")), broadcastHint = hint))),
        Tables.resolve(spark, sf))
      val hinted = run(hint = true).queryExecution.executedPlan.toString
      assert(hinted.contains("BroadcastHashJoin"), hinted.take(600))
      val unhinted = run(hint = false).queryExecution.executedPlan.toString
      assert(!unhinted.contains("BroadcastHashJoin"), unhinted.take(600))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_bm25: term stats ride broadcast joins, never a corpus-side shuffle join") {
    val p = planOf("q_bm25")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q_skyline: frontier joins back as a broadcast, no range-partition sort") {
    val p = planOf("q_skyline")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(800))
  }

  test("q_triangle_count: no cartesian/nested-loop anywhere in the wedge pipeline") {
    val p = planOf("q_triangle_count")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(800))
  }

  test("q_grouped_trend: partial aggregation before the exchange") {
    val p = planOf("q_grouped_trend")
    assert(p.contains("partial"), p.take(800))
  }

  test("q_roc_auc (decomposed): no per-group-only window partition anywhere") {
    // the RankDecomp promise — every Window partitions by (group, bucket)
    // or iterates the bucket list; a bare group-partitioned window would
    // mean a whale group sorts in one task again
    val plan = planOf("q_roc_auc")
    val windowSpecs = plan.linesIterator
      .filter(_.contains("Window "))
      .toSeq
    // within-bucket level partitions by (group, bucket); the offsets
    // level partitions by group but runs over the BUCKET LIST (ordered
    // by __b) — what must never reappear is a group-only window over
    // the raw value axis (ordered by __v): that is the whale sort
    assert(windowSpecs.exists(l =>
      l.contains("l_linestatus") && l.contains("__b") && l.contains("__v")),
      s"within-bucket window missing:\n${windowSpecs.mkString("\n")}")
    assert(!windowSpecs.exists(l =>
      l.contains("__v ") && !l.contains("__b")),
      s"group-only window over raw values reappeared:\n${windowSpecs.mkString("\n")}")
  }

  test("q_kendall_tau: cell self-join is a hash join, never a nested loop") {
    val plan = planOf("q_kendall_tau")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      "cell collapse must partial-aggregate map-side")
  }

  test("q_prorate: zero exchanges — proration is scan-stage explode only") {
    val plan = planOf("q_prorate")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") ||
      l.contains("Exchange rangepartitioning") && !l.contains("ENSURE")),
      s"proration must not shuffle:\n$plan")
    assert(plan.contains("Generate explode"), "sequence explode missing")
  }

}
