package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Leakage-split contracts: cluster members share a split, singletons
  * match the plain content-hash split, determinism, and the audit twin.
  */
class LeakageSplitSpec extends SparkSpec {

  import spark.implicits._

  // 1/2/3 near-dup cluster; 10 and 20 unrelated singletons
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (10L, "completely different text about spark shuffles and joins"),
    (20L, "unrelated third document mentioning parquet row groups only")
  ).toDF("doc_id", "text")

  test("every member of a near-dup cluster lands in the same split") {
    val s = LeakageSplit.leakageFreeSplit(docs, "text", "doc_id",
        trainPct = 50, minJaccard = 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(s.size == 5)
    val clusterSplits = Seq(1L, 2L, 3L).map(s(_)).toSet
    assert(clusterSplits.size == 1, s"cluster straddles splits: $clusterSplits")
    assert(clusterSplits.head._1 == 1L) // min-id representative
  }

  test("singletons split exactly like the plain content-hash split") {
    val s = LeakageSplit.leakageFreeSplit(docs, "text", "doc_id",
        trainPct = 50, minJaccard = 0.4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val plain = docs.where(col("doc_id") >= 10L)
      .select(col("doc_id"), graft.text.CorpusFilters.splitAssign(
        col("doc_id").cast("string"), 50).as("sp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s(10L) == plain(10L) && s(20L) == plain(20L))
  }

  test("deterministic across partitionings") {
    def run(p: Int) = LeakageSplit.leakageFreeSplit(
        docs.repartition(p), "text", "doc_id", trainPct = 80, minJaccard = 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(run(1) == run(5))
  }

  test("splitLeakage flags exactly the pairs straddling an external split") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 20L)).toDF("left_id", "right_id")
    val badSplit = Seq((1L, "train"), (2L, "val"), (3L, "train"),
      (10L, "train"), (20L, "train")).toDF("doc_id", "split")
    val leaks = LeakageSplit.splitLeakage(pairs, badSplit, "doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(leaks == Set((1L, 2L), (2L, 3L)))
    // the leakage-free split audits clean against its own pair graph
    val good = LeakageSplit.leakageFreeSplit(docs, "text", "doc_id", 50, minJaccard = 0.4)
    val ownPairs = Dedup.dedupMinhashPairs(docs, "text", "doc_id", minJaccard = 0.4)
      .select("left_id", "right_id")
    assert(LeakageSplit.splitLeakage(ownPairs, good, "doc_id", "split").count() == 0)
  }
}
