package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k sketch: the k smallest values of a Long column per group — the
  * custom-aggregate extension point (`Aggregator[IN,BUF,OUT]` with map-side
  * partial merge). `distinct = false` keeps a multiset (consistent sample);
  * `distinct = true` keeps the k smallest DISTINCT values — the classic KMV
  * sketch, whose k-th minimum is a distinct-count estimator
  * ([[BottomK.kmvEstimate]]) and whose intersections estimate per-group
  * Jaccard. Both modes are order- and partitioning-independent, so results
  * are identical on any cluster layout.
  *
  * Scale contract vs the window formulation (`row_number() OVER (PARTITION
  * BY g ORDER BY v) <= k`): the window shuffles and sorts EVERY row; the
  * aggregator reduces each partition to ≤k values per group BEFORE the
  * exchange (classic partial aggregation), so shuffle volume is
  * O(groups × k × partitions) regardless of row count.
  *
  * Buffer is a sorted Array[Long] of ≤ k elements; insert/merge are O(k)
  * per call — fine for the sketch-sized k (≤ a few hundred) this is for.
  */
class BottomK(k: Int, distinct: Boolean = false) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Binary search in the sorted prefix — O(log k) duplicate check. */
  private def containsSorted(buf: Array[Long], v: Long): Boolean =
    java.util.Arrays.binarySearch(buf, v) >= 0

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (distinct && containsSorted(buf, v)) buf
    else if (buf.length < k) {
      // growth phase (first ≤k rows of a group): allocate the larger array
      val out = new Array[Long](buf.length + 1)
      insertSorted(buf, buf.length, v, out); out
    } else if (v < buf(k - 1)) {
      // steady state: shift in place (the Aggregator contract permits
      // mutating and returning the buffer) — zero allocation in the
      // map-side hot loop this aggregate exists to keep cheap
      var i = k - 1
      while (i > 0 && buf(i - 1) > v) { buf(i) = buf(i - 1); i -= 1 }
      buf(i) = v
      buf
    } else buf

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-merge truncated at k; in distinct mode equal values collapse
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      if (!distinct || o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  /** Copy `src[0, n)` and `v` into `out` keeping ascending order. */
  private def insertSorted(src: Array[Long], n: Int, v: Long, out: Array[Long]): Unit = {
    var i = 0
    while (i < n && src(i) <= v) { out(i) = src(i); i += 1 }
    out(i) = v
    while (i < n) { out(i + 1) = src(i); i += 1 }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BottomK {
  /** Column form: `bottomK(8)(col)` usable inside `groupBy(...).agg(...)`. */
  def apply(k: Int)(c: Column): Column = udaf(new BottomK(k)).apply(c)

  /** KMV (distinct) variant — feeds [[kmvEstimate]]. */
  def distinct(k: Int)(c: Column): Column = udaf(new BottomK(k, distinct = true)).apply(c)

  /** Merge two DISTINCT bottom-k sketches into the distinct bottom-k of
    * the UNION of their underlying sets — the closure property that makes
    * KMV a set-algebra sketch, not just a counter: sketch(A) ⊕ sketch(B) =
    * sketch(A ∪ B) exactly (both sides retain the k smallest distinct
    * hashes, and every union member smaller than both k-th minima is
    * present in one input). Feeding the merge to [[kmvEstimate]] gives
    * |A ∪ B|; inclusion–exclusion then gives |A ∩ B| — per-pair corpus
    * overlap WITHOUT re-touching either corpus, from two k-length arrays.
    * Pure codegen'd array arithmetic (sort ∘ distinct ∘ concat, truncated
    * at k) — no UDF, no re-aggregation.
    */
  def kmvMerge(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{array_distinct, array_sort, concat, slice}
    slice(array_sort(array_distinct(concat(a, b))), 1, k)
  }

  /** Distinct-count estimate from a DISTINCT bottom-k sketch over hashes
    * uniform in [0, m): fewer than k values means the sketch saw every
    * distinct hash (exact count); otherwise the classic KMV estimator
    * (k-1) * m / h_k. Pure double arithmetic on the k-th minimum —
    * deterministic, so unlike an RNG-seeded HLL it is exactly replayable by
    * another engine running the same formula.
    */
  def kmvEstimate(sketch: Column, k: Int, m: Long): Column = {
    import org.apache.spark.sql.functions.{element_at, size, when}
    import org.apache.spark.sql.types.DoubleType
    when(size(sketch) < k, size(sketch).cast(DoubleType))
      .otherwise(org.apache.spark.sql.functions.lit((k - 1).toDouble * m) /
        element_at(sketch, k).cast(DoubleType))
  }
}
