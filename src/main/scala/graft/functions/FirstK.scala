package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** First-k rows per group in ascending (t, id) order, each carrying a string
  * payload — the payload variant of the bounded-buffer family ([[TopKByScore]]
  * keeps the best (score, id) pairs; [[BottomK]] the smallest values; this
  * keeps the EARLIEST k (t, id) keys together with a payload column, which is
  * what per-key sequence assembly needs: "the first `maxEvents` event types
  * per user").
  *
  * Scale contract vs `collect_list` + `slice`: collect_list buffers a key's
  * ENTIRE row set before the cut — one whale key (a bot user with 10⁸
  * events) concentrates its whole history in one aggregation buffer and OOMs
  * that task. This Aggregator's buffer never exceeds k entries per (group,
  * partition), and map-side partial aggregation ships ≤k entries per group
  * per partition into the exchange — whale keys cost O(rows) comparisons
  * locally and bounded memory everywhere.
  *
  * Total order is (t, id, payload) lexicographic with a null payload first —
  * exactly the order `array_sort` gives an ascending `struct(t, id, payload)`
  * column — so results are partitioning-independent and replayable by another
  * engine even under duplicate (t, id) keys.
  */
class FirstKByKey(k: Int)
    extends Aggregator[(Long, Long, String), Array[(Long, Long, String)], Seq[(Long, Long, String)]] {
  require(k > 0, "k must be positive")

  // UTF-8 BYTE order, not String.compareTo's UTF-16 code-unit order: Spark
  // compares string struct fields as UTF8String binary, and the two orders
  // diverge for supplementary characters (surrogate pairs sort before
  // U+E000..U+FFFF in UTF-16 but after in UTF-8) — the array_sort
  // equivalence this aggregator documents requires the byte order. Only
  // reached on (t, id) ties, so the allocation is off the hot path.
  private def cmpPayload(x: String, y: String): Int =
    if (x == null && y == null) 0
    else if (x == null) -1
    else if (y == null) 1
    else java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** true when a orders strictly before b. */
  @inline private def before(a: (Long, Long, String), b: (Long, Long, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 &&
      (a._2 < b._2 || (a._2 == b._2 && cmpPayload(a._3, b._3) < 0)))

  override def zero: Array[(Long, Long, String)] = Array.empty

  override def reduce(buf: Array[(Long, Long, String)],
                      v: (Long, Long, String)): Array[(Long, Long, String)] =
    if (buf.length < k) {
      // growth phase (first ≤k rows of a group): allocate the larger array
      val out = new Array[(Long, Long, String)](buf.length + 1)
      insert(buf, buf.length, v, out); out
    } else if (before(v, buf(k - 1))) {
      // steady state: shift in place (the Aggregator contract permits
      // mutating and returning the buffer) — zero allocation in the
      // map-side hot loop the bounded buffer exists to keep cheap
      var i = k - 1
      while (i > 0 && before(v, buf(i - 1))) { buf(i) = buf(i - 1); i -= 1 }
      buf(i) = v
      buf
    } else buf

  override def merge(a: Array[(Long, Long, String)],
                     b: Array[(Long, Long, String)]): Array[(Long, Long, String)] = {
    val out = new Array[(Long, Long, String)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      val takeA = j >= b.length || (i < a.length && !before(b(j), a(i)))
      out(o) = if (takeA) { i += 1; a(i - 1) } else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(Long, Long, String)]): Seq[(Long, Long, String)] = buf.toSeq

  /** Copy `src[0, n)` and `v` into `out` keeping earliest-first order. */
  private def insert(src: Array[(Long, Long, String)], n: Int, v: (Long, Long, String),
                     out: Array[(Long, Long, String)]): Unit = {
    var i = 0
    while (i < n && !before(v, src(i))) { out(i) = src(i); i += 1 }
    out(i) = v
    while (i < n) { out(i + 1) = src(i); i += 1 }
  }

  override def bufferEncoder: Encoder[Array[(Long, Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long, String)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, String)]]()
}

object FirstK {
  /** Aggregate column: `agg(FirstK(64)(tCol, idCol, payloadCol))` → array of
    * (t, id, payload) structs (tuple fields `_1`/`_2`/`_3`), earliest first.
    *
    * Non-null contract: key columns (t, id) must be non-null — callers drop
    * unrankable rows before aggregating (same contract as [[TopK.perGroup]]);
    * the payload may be null and sorts first among equal keys.
    */
  def apply(k: Int)(t: Column, id: Column, payload: Column): Column =
    udaf(new FirstKByKey(k))
      .apply(t.cast("long"), id.cast("long"), payload.cast("string"))
}
