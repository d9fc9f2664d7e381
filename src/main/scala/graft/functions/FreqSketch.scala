package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: the top frequent items of a column with a
  * bounded k-counter summary per partition instead of a full GROUP BY —
  * the scale path for heavy-hitter questions over columns whose
  * cardinality dwarfs memory (tokens, URLs, user ids at 100 TB). A plain
  * `groupBy(col).count()` shuffles EVERY distinct key; this `Aggregator`
  * reduces each map partition to ≤k counters and merges summaries
  * (Agarwal et al., "Mergeable Summaries": add counts, subtract the
  * (k+1)-th largest, drop non-positives), so shuffle volume is
  * O(k × partitions) regardless of cardinality.
  *
  * Guarantees (n = rows folded): every item with true count > n/(k+1) is
  * present in the summary, and each reported count undercounts by at most
  * n/(k+1). With fewer than k distinct items no decrement ever fires and
  * counts are EXACT — the regime the oracle gate runs in; the
  * approximation guarantees are spec-checked on adversarial streams.
  *
  * Output is (item, count) best-first with the deterministic
  * (count desc, item asc) total order, like [[TopKByScore]]/[[BottomK]].
  */
class FreqSketch(k: Int)
    extends Aggregator[String, java.util.HashMap[String, java.lang.Long], Seq[(String, Long)]] {
  require(k > 0, "k must be positive")

  private type Buf = java.util.HashMap[String, java.lang.Long]

  override def zero: Buf = new Buf()

  // buffer mutated in place (Aggregator permits it, like TopKByScore's
  // array buffer): the high-cardinality steady state hits the full-buffer
  // decrement on nearly every row, and an immutable-map rebuild there would
  // allocate O(k) per input row on the corpus-wide pass
  override def reduce(buf: Buf, item: String): Buf = {
    if (item == null) return buf
    val c = buf.get(item)
    if (c != null) buf.put(item, c + 1L)
    else if (buf.size < k) buf.put(item, 1L)
    else {
      // classic MG step: a new item with a full summary decrements every
      // counter (the new item's single count cancels against them)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val itb = b.entrySet().iterator()
    while (itb.hasNext) {
      val e = itb.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count, drop what hits zero
      val counts = new Array[Long](a.size)
      val itc = a.values().iterator()
      var i = 0
      while (itc.hasNext) { counts(i) = itc.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k)
      val ita = a.entrySet().iterator()
      while (ita.hasNext) {
        val e = ita.next()
        if (e.getValue <= cut) ita.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  override def finish(buf: Buf): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out += ((e.getKey, e.getValue.longValue())) }
    out.result().sortBy { case (i, c) => (-c, i) }
  }

  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object FreqItems {

  /** Aggregate column: `agg(FreqItems(k)(itemCol))` → array of
    * (item, count) structs, most frequent first.
    */
  def apply(k: Int)(item: Column): Column =
    udaf(new FreqSketch(k)).apply(item.cast("string"))

  /** Global top-`top` heavy hitters as a table: (rank, item, cnt). */
  def topItems(df: DataFrame, item: Column, k: Int, top: Int): DataFrame =
    df.agg(FreqItems(k)(item).as("__fi"))
      .select(posexplode(col("__fi")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col._1").as("item"), col("col._2").as("cnt"))
      .where(col("rank") <= top)

  /** Per-group heavy hitters: one row per (group, rank) with rank
    * 1..`top` — the relational form, like [[TopK.perGroup]].
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], item: Column,
               k: Int, top: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(FreqItems(k)(item).as("__fi"))
      .select(groupCols.map(col) :+ posexplode(col("__fi")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col._1").as("item"), col("col._2").as("cnt")): _*)
      .where(col("rank") <= top)
}
