package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Serialized form of a [[QuantileSketch]] buffer: `levels(l)` holds
  * values of weight 2^l; `parities(l)` is the deterministic-alternation
  * bit for the next compaction of level l; `touched(l)` records whether
  * the level has EVER held state (a level that compacted cleanly to empty
  * is empty-but-touched, and its flipped parity is live state that a
  * merge must not overwrite — only a genuinely fresh level adopts the
  * other side's parity). Buffer-internal only (kryo-encoded); the
  * portable [[KllSummary]] doesn't carry it — rehydrated levels are all
  * touched by definition.
  */
final case class QSketchBuf(levels: ArrayBuffer[ArrayBuffer[Long]],
                            parities: ArrayBuffer[Boolean],
                            touched: ArrayBuffer[Boolean])

/** Mergeable multi-level quantile summary over INTEGER-valued columns
  * (scale fractional inputs first — cents, micros; integer ranks are what
  * keep the summary engine-exact) — the quantile member of the mergeable-
  * summaries family beside [[FreqSketch]] (heavy hitters), [[BottomK]]
  * (distinct estimate) and [[TopKByScore]]: a full-sort `percentile` over
  * a 100 TB column shuffles everything; this ships an
  * O(k·log(n/k))-entry summary per (group, partition) and merges
  * summaries, so shuffle volume scales with k, not row count.
  *
  * Mechanics: the KLL compaction scheme (Karnin-Lang-Liberman 2016) with
  * DETERMINISTIC alternation instead of coin flips (the paper's
  * derandomization: one parity bit per level — same summary for the same
  * fold order, no RNG in an aggregation buffer): values live in levels of
  * weight 2^l and capacity 2k; a full level sorts, keeps alternate
  * elements (parity flipping per compaction, which cancels the rank bias
  * the fixed choice would accumulate), and promotes them to weight
  * 2^(l+1). Each level-l compaction perturbs any rank by ≤ 2^l, and
  * level counts fall geometrically, so total rank error stays O(n/k)
  * with a small constant (spec-checked on adversarial streams across
  * partitionings).
  *
  * EXACT regime: while a group folds FEWER THAN 2k values no compaction ever
  * fires, and the reported quantile is exactly the discrete quantile
  * "smallest value whose cumulative count ≥ ⌈φ·n⌉" — DuckDB/Postgres
  * `quantile_disc`/`percentile_disc` semantics, the regime the oracle
  * gate runs in (like [[FreqSketch]]'s exact-count regime). Quantile
  * fractions are integer pairs `(num, den)` — no float rank arithmetic
  * anywhere.
  */
class QuantileSketch(k: Int, qs: Seq[(Long, Long)])
    extends Aggregator[java.lang.Long, QSketchBuf, Seq[Long]] {
  KllOps.requireValidFractions(k, qs)
  private val cap = 2 * k
  override def zero: QSketchBuf = KllOps.zero
  override def reduce(buf: QSketchBuf, v: java.lang.Long): QSketchBuf =
    KllOps.reduce(buf, v, cap)
  override def merge(a: QSketchBuf, b: QSketchBuf): QSketchBuf =
    KllOps.merge(a, b, cap)
  override def finish(buf: QSketchBuf): Seq[Long] = KllOps.quantiles(buf, qs)
  override def bufferEncoder: Encoder[QSketchBuf] =
    org.apache.spark.sql.Encoders.kryo[QSketchBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Values → portable serialized summary — the build step of the
  * maintained quantile store ([[graft.operators.QuantileStore]]): same
  * buffer mechanics as [[QuantileSketch]] (delegated to [[KllOps]]), but
  * the output is the (levels, parities) summary itself, storable and
  * mergeable later.
  */
class QuantileSummaryAgg(k: Int)
    extends Aggregator[java.lang.Long, QSketchBuf, KllSummary] {
  require(k > 1, s"summary size k must be > 1, got $k")
  private val cap = 2 * k
  override def zero: QSketchBuf = KllOps.zero
  override def reduce(buf: QSketchBuf, v: java.lang.Long): QSketchBuf =
    KllOps.reduce(buf, v, cap)
  override def merge(a: QSketchBuf, b: QSketchBuf): QSketchBuf =
    KllOps.merge(a, b, cap)
  override def finish(buf: QSketchBuf): KllSummary = KllOps.toSummary(buf)
  override def bufferEncoder: Encoder[QSketchBuf] =
    org.apache.spark.sql.Encoders.kryo[QSketchBuf]
  override def outputEncoder: Encoder[KllSummary] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllSummary]()
}

/** Summaries → merged summary or quantiles — the fold/read steps of the
  * maintained store: rehydrates each input summary and merges it with
  * the SAME cascade a live aggregation would run (the carried parity
  * bits make the fold exactly one continuous aggregation).
  */
class SummaryMergeAgg(k: Int, qs: Seq[(Long, Long)])
    extends Aggregator[KllSummary, QSketchBuf, Seq[Long]] {
  KllOps.requireValidFractions(k, qs)
  private val cap = 2 * k
  override def zero: QSketchBuf = KllOps.zero
  override def reduce(buf: QSketchBuf, s: KllSummary): QSketchBuf =
    if (s == null) buf else KllOps.merge(buf, KllOps.fromSummary(s), cap)
  override def merge(a: QSketchBuf, b: QSketchBuf): QSketchBuf =
    KllOps.merge(a, b, cap)
  override def finish(buf: QSketchBuf): Seq[Long] = KllOps.quantiles(buf, qs)
  override def bufferEncoder: Encoder[QSketchBuf] =
    org.apache.spark.sql.Encoders.kryo[QSketchBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** The summary-output twin of [[SummaryMergeAgg]] — folds summaries into
  * a NEW summary (the store-update aggregate).
  */
class SummaryFoldAgg(k: Int)
    extends Aggregator[KllSummary, QSketchBuf, KllSummary] {
  require(k > 1, s"summary size k must be > 1, got $k")
  private val cap = 2 * k
  override def zero: QSketchBuf = KllOps.zero
  override def reduce(buf: QSketchBuf, s: KllSummary): QSketchBuf =
    if (s == null) buf else KllOps.merge(buf, KllOps.fromSummary(s), cap)
  override def merge(a: QSketchBuf, b: QSketchBuf): QSketchBuf =
    KllOps.merge(a, b, cap)
  override def finish(buf: QSketchBuf): KllSummary = KllOps.toSummary(buf)
  override def bufferEncoder: Encoder[QSketchBuf] =
    org.apache.spark.sql.Encoders.kryo[QSketchBuf]
  override def outputEncoder: Encoder[KllSummary] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllSummary]()
}

object Quantiles {

  /** Aggregate column: array of discrete quantiles of `value` (cast to
    * long) at the integer fractions `qs`, summary size `k`.
    */
  def apply(k: Int, qs: Seq[(Long, Long)])(value: Column): Column =
    udaf(new QuantileSketch(k, qs)).apply(value.cast("long"))

  /** Per-group quantiles as columns: one row per group, one column per
    * requested fraction (named by `names`).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], value: Column,
               k: Int, qs: Seq[(Long, Long)], names: Seq[String]): DataFrame = {
    require(names.length == qs.length, "one name per fraction")
    df.groupBy(groupCols.map(col): _*)
      .agg(Quantiles(k, qs)(value).as("__q"))
      .select(groupCols.map(col) ++ names.zipWithIndex.map { case (n, i) =>
        element_at(col("__q"), i + 1).as(n)
      }: _*)
  }

  /** Winsorization: clip `value` to its per-group [lo, hi] discrete
    * quantiles — the outlier-robust normalization step (feature prep,
    * label clipping) a curation pipeline runs over skewed numerics.
    * Appended as column `outCol`.
    *
    * Scale shape: the bounds frame is ONE row per group (a per-group KLL
    * summary, bounded buffer, map-side partial merge), the clip join is
    * group-keyed (broadcastable when groups are few), and the clip itself
    * is scan-stage `least`/`greatest` — no window over row data, no
    * second pass at corpus width.
    */
  def winsorizePerGroup(df: DataFrame, groupCols: Seq[String], value: Column,
                        k: Int, lo: (Long, Long), hi: (Long, Long),
                        outCol: String): DataFrame = {
    val bounds = perGroup(df, groupCols, value, k, Seq(lo, hi), Seq("__lo", "__hi"))
    df.join(bounds, groupCols)
      .withColumn(outCol,
        least(greatest(value.cast("long"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}
