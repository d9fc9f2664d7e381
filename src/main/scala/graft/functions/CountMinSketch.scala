package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch: a depth×width counter matrix estimating per-item
  * frequencies of an unbounded-cardinality stream in O(depth·width) space
  * (reference surface: the frequency/profiling family around
  * fabrix-core/src/fabrix/dataframe.rs value counting; Cormode &
  * Muthukrishnan 2005). Complements [[FreqSketch]] (Misra-Gries): MG
  * answers "what are the heavy hitters", CMS answers "how often did THIS
  * item occur" for any queried item, with a one-sided error — estimates
  * never undercount, and overcount by at most εN with probability 1−δ
  * (ε = e/width, δ = e^−depth).
  *
  * Scale contract: the buffer is a fixed Array[Long] of depth·width
  * counters per (group, partition) regardless of stream cardinality, and
  * map-side partial aggregation merges matrices element-wise — shuffle
  * volume is O(groups × depth·width × partitions), never O(rows). The
  * matrix is a commutative monoid (element-wise +), so results are
  * identical on any partitioning or merge order.
  *
  * Hashing is the portable md5-prefix idiom ([[Md5Prefix60]] over a
  * per-depth seed prefix), computed in the codegen'd scan stage via
  * [[CountMinSketch.buckets]] — the aggregator itself only increments.
  * Any engine (the DuckDB oracle included) can replay the exact sketch
  * from the same md5 arithmetic, so estimates are cross-engine
  * deterministic even in the colliding regime.
  */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
  require(depth > 0 && width > 0, "depth and width must be positive")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], buckets: Seq[Int]): Array[Long] = {
    // a null/absent bucket vector (null item) contributes nothing — CMS
    // counts rankable items only, matching the oracle's GROUP BY lang
    if (buckets != null && buckets.length == depth) {
      var d = 0
      while (d < depth) { buf(d * width + buckets(d)) += 1L; d += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMinSketch {
  /** Column form: `CountMinSketch(3, 64)(buckets(col, 3, 64))` inside
    * `agg(...)`.
    */
  def apply(depth: Int, width: Int)(bucketsCol: Column): Column =
    udaf(new CountMinSketch(depth, width)).apply(bucketsCol)

  /** Per-depth seed prefix — shared by [[buckets]], [[estimate]] and the
    * SQL oracle so all three address the same counter cells.
    */
  private def seed(d: Int): String = s"cms$d:"

  /** The depth bucket indices of `item`, as codegen'd Column arithmetic in
    * the scan stage (no UDF): bucket_d = md5_60(seed_d ‖ item) mod width.
    * NULL item ⇒ NULL vector ⇒ the aggregator skips the row.
    */
  def buckets(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { d =>
      pmod(Md5Prefix60(concat(lit(seed(d)), item)), lit(width.toLong)).cast("int")
    }: _*)

  /** Point estimate of `item`'s frequency from a finished sketch column:
    * min over depths of the item's counter cell.
    */
  def estimate(sketch: Column, item: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { d =>
      val b = pmod(Md5Prefix60(concat(lit(seed(d)), item)), lit(width.toLong))
      element_at(sketch, (b + lit(d.toLong * width + 1L)).cast("int"))
    }: _*)

  /** AMS-style inner product of two finished sketches (same depth/width/
    * seeds): min over depths of Σ_cell a·b — an upper bound on the true
    * join size Σ_key n_a(key)·n_b(key) (collisions only ADD cross terms),
    * within ε·N_a·N_b with probability 1−δ. This is the sketch tier of
    * the join-explosion ladder: [[graft.operators.GuardedJoin]] computes
    * the exact size with a key-sized join; two 2 KB sketches built in one
    * pass per side answer the same question when even that pre-check is
    * too heavy (or the sides are sketched ONCE and asked about many
    * joins). The HOF runs on single sketch rows — never row data.
    */
  def innerProduct(a: Column, b: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { d =>
      aggregate(
        zip_with(slice(a, d * width + 1, width), slice(b, d * width + 1, width),
          (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
    }: _*)

  /** DuckDB oracle: replay the sketch exactly — per-item true counts,
    * bucketed by the same md5 arithmetic, summed per cell, min over
    * depths. True for ANY collision pattern, not just the exact regime.
    */
  def estimateOracle(table: String, itemCol: String, depth: Int, width: Int): String = {
    val bucketExprs = (0 until depth)
      .map(d => s"CAST(('0x'||substr(md5('${seed(d)}'||$itemCol),1,15)) AS BIGINT) % $width AS b$d")
      .mkString(",\n  ")
    val cellCtes = (0 until depth)
      .map(d => s"s$d AS (SELECT b$d, CAST(sum(cnt) AS BIGINT) AS t$d FROM bk GROUP BY b$d)")
      .mkString(",\n")
    val joins = (0 until depth).map(d => s"JOIN s$d USING (b$d)").mkString(" ")
    val leastArgs = (0 until depth).map(d => s"t$d").mkString(", ")
    s"""WITH counts AS (SELECT $itemCol, count(*) AS cnt FROM $table
  WHERE $itemCol IS NOT NULL GROUP BY $itemCol),
bk AS (SELECT $itemCol, cnt,
  $bucketExprs
FROM counts),
$cellCtes
SELECT bk.$itemCol, least($leastArgs) AS est
FROM bk $joins
ORDER BY bk.$itemCol"""
  }
}
