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
class FreqSketch(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    if (item == null) buf
    else buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // classic MG step: a new item with a full summary decrements every
        // counter (the new item's single count cancels against them)
        buf.iterator.collect { case (i, c) if c > 1 => (i, c - 1) }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, drop what hits zero
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.iterator.collect { case (i, c) if c > cut => (i, c - cut) }.toMap
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (i, c) => (-c, i) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
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
