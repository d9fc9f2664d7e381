package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Runtime-filter join pruning: build a bloom filter over the (already
  * filtered) dim side's join keys and probe it in the fact side's SCAN
  * stage, so fact rows that cannot possibly match are dropped BEFORE the
  * join shuffle (reference surface: the join family of fabrix-core/src/
  * fabrix/dataframe.rs; the technique is the classic sideways information
  * passing Spark itself applies under
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, exposed here as an
  * explicit operator so the pruning is guaranteed, not cost-model
  * dependent).
  *
  * The point at 100 TB: a selective dim predicate (say 1 in 50 part rows
  * survive) means ~98% of fact rows have no match — without the filter
  * they all shuffle into the join anyway. The bloom (a bit array, MBs for
  * millions of keys) rides the plan as a reference object into every fact
  * scan task; probe-negative rows never leave the scan stage. No false
  * negatives ⇒ the inner-join result is EXACTLY the plain join's; false
  * positives only cost shuffle bytes, and the join itself re-verifies.
  */
object RuntimeFilter {

  /** Inner equi-join of `fact` with `dim` on `factKey === dimKey`, with a
    * bloom-filter probe on `factKey` pushed into the fact scan.
    *
    * `expectedDimKeys` sizes the filter (overestimate is safe — bits are
    * cheap; underestimate inflates fpp, never wrongly drops). The dim side
    * is double-scanned (once to build, once to join) — dim is small by
    * contract, fact never scans twice.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedDimKeys > 0, "expectedDimKeys must be positive")
    // same tree-merge build shape as Dedup.dedupIncrementalBloom: total on
    // an empty dim (zero-key filter rejects everything, join of nothing)
    val bloom = dim.select(col(dimKey).cast("long")).rdd
      .treeAggregate(BloomFilter.create(expectedDimKeys, fpp))(
        (f, row) => { if (!row.isNullAt(0)) f.putLong(row.getLong(0)); f },
        (a, b) => { a.mergeInPlace(b); a })
    val probe: Column =
      graft.functions.BloomMightContain(fact(factKey).cast("long"), bloom)
    // NULL fact keys never match an inner join; the NULL probe drops them
    // with the same scan-stage filter instead of carrying them to the join
    fact.where(probe.isNotNull && probe)
      .join(dim, fact(factKey) === dim(dimKey), "inner")
  }
}
