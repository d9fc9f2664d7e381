package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dense 0-based row index that never leaves Tungsten.
  *
  * `df.rdd.zipWithIndex` (the obvious route) deserializes every row to a
  * GenericRow, kills whole-stage codegen and columnar batches, and rewrites
  * the full dataset through Java objects — a non-starter at 100 TB. Instead:
  *
  *  1. `monotonically_increasing_id()` encodes (partitionId << 33 | localSeq)
  *     — per-partition-contiguous by contract;
  *  2. per-partition row counts come from a tiny `groupBy(pid)` aggregate
  *     (shuffles only numPartitions rows);
  *  3. a cumulative-sum window over that tiny table yields each partition's
  *     global offset, broadcast-joined back;
  *  4. global index = offset + localSeq.
  *
  * Everything stays DataFrame ops (codegen'd); the input is evaluated twice
  * (count pass + output pass) exactly like zipWithIndex's hidden count job —
  * cache the INPUT when that matters. Index assignment is deterministic for
  * a fixed partition layout, same contract as zipWithIndex.
  *
  * Do NOT `persist()` the OUTPUT: correctness of the internal offset join
  * relies on exchange reuse giving both evaluations of the input the same
  * partition layout, and caching re-plans the subtree under AQE's
  * cached-plan rules — the two evaluations decouple and rows silently
  * drop (verified empirically). To pin the output for multiple consumers,
  * `localCheckpoint` it (materializes one consistent snapshot); see
  * [[graft.llm.NegativeSampling]].
  */
object DenseIndex {

  private val PartitionCapBits = 33L // monotonically_increasing_id local-seq width

  /** [[withDenseIndex]] over an input whose partition layout is NOT
    * deterministic across evaluations — anything downstream of a RANGE
    * exchange. `RangePartitioner` seeds its boundary-sampling from the
    * RDD id, so the offsets pass and the output pass (which plan as two
    * independent subtrees whenever exchange reuse doesn't canonicalize
    * them together) draw DIFFERENT boundaries: per-partition counts then
    * disagree with per-partition contents and ranks silently corrupt
    * (observed as run-to-run NTILE bucket drift the moment the exchange
    * holds more than one partition — small inputs coalescing to a single
    * partition had masked it). The lazy local checkpoint pins ONE
    * materialized snapshot that both passes read — and the expensive
    * range sort runs once instead of twice.
    */
  def withDenseIndexPinned(df: DataFrame, name: String): DataFrame =
    withDenseIndex(df.localCheckpoint(false), name)

  def withDenseIndex(df: DataFrame, name: String): DataFrame = {
    val pid = "__di_pid"; val mid = "__di_mid"; val off = "__di_off"
    val tagged = df
      .withColumn(pid, spark_partition_id())
      .withColumn(mid, monotonically_increasing_id())
    val offsets = tagged.groupBy(col(pid)).count()
      .withColumn(off,
        coalesce(sum(col("count")).over(
          Window.orderBy(col(pid)).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(pid), col(off))
    val localSeq = col(mid) - (col(pid).cast(LongType) * lit(1L << PartitionCapBits))
    tagged
      .join(broadcast(offsets), pid)
      .withColumn(name, (col(off) + localSeq).cast(LongType))
      .drop(pid, mid, off)
      .select(name, df.columns.toIndexedSeq: _*)
  }
}
