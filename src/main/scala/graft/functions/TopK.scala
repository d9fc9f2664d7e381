package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k rows per group by (score DESC, id ASC) — the "best k examples per
  * bucket" selector a curation pipeline runs constantly (best documents per
  * domain, nearest neighbors per query, highest-quality members per
  * cluster).
  *
  * Scale contract vs the window formulation (`row_number() OVER (PARTITION
  * BY g ORDER BY s DESC) <= k`): the window shuffles and SORTS every row of
  * every group; this `Aggregator` reduces each map partition to ≤k
  * (score, id) pairs per group before the exchange (partial aggregation),
  * so shuffle volume is O(groups × k × partitions) no matter how many rows
  * a group has — the whale-group case (one domain with 10⁹ documents) costs
  * each task O(rows × log-ish k) locally and ships back k pairs.
  *
  * The deterministic (score desc, id asc) total order makes results
  * partitioning-independent and exactly replayable by another engine — the
  * same determinism contract as [[BottomK]].
  */
class TopKByScore(k: Int) extends Aggregator[(Double, Long), Array[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  /** true when a ranks strictly better than b: higher score, ties → lower id. */
  @inline private def better(as: Double, ai: Long, bs: Double, bi: Long): Boolean =
    as > bs || (as == bs && ai < bi)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], v: (Double, Long)): Array[(Double, Long)] =
    if (buf.length < k) {
      val out = new Array[(Double, Long)](buf.length + 1)
      insert(buf, buf.length, v, out); out
    } else if (better(v._1, v._2, buf(k - 1)._1, buf(k - 1)._2)) {
      // steady state: shift in place (Aggregator permits buffer mutation)
      var i = k - 1
      while (i > 0 && better(v._1, v._2, buf(i - 1)._1, buf(i - 1)._2)) {
        buf(i) = buf(i - 1); i -= 1
      }
      buf(i) = v
      buf
    } else buf

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      val takeA = j >= b.length ||
        (i < a.length && better(a(i)._1, a(i)._2, b(j)._1, b(j)._2))
      out(o) = if (takeA) { i += 1; a(i - 1) } else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(Double, Long)]): Seq[(Double, Long)] = buf.toSeq

  /** Copy `src[0, n)` and `v` into `out` keeping best-first order. */
  private def insert(src: Array[(Double, Long)], n: Int, v: (Double, Long),
                     out: Array[(Double, Long)]): Unit = {
    var i = 0
    while (i < n && !better(v._1, v._2, src(i)._1, src(i)._2)) { out(i) = src(i); i += 1 }
    out(i) = v
    while (i < n) { out(i + 1) = src(i); i += 1 }
  }

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {
  /** Aggregate column: `agg(TopK(3)(scoreCol, idCol))` → array of
    * (score, id) structs, best first.
    */
  def apply(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k))
      .apply(score.cast("double"), id.cast("long"))

  /** Top-k table: one row per (group, rank) with rank 1..k — the relational
    * form. `df.groupBy(keys).agg(...)` then posexplode; ranks are dense and
    * deterministic.
    *
    * Non-null contract: rows with a NULL score or id are dropped before
    * ranking — the bounded buffer is primitive (Double, Long) and cannot
    * hold nulls, and an unrankable candidate has no place in a top-k. (A
    * plain window formulation would instead rank NULL scores last; callers
    * wanting that semantics must rank nulls themselves.)
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], score: Column, id: Column,
               k: Int): DataFrame = {
    val g = df.where(score.isNotNull && id.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(TopK(k)(score, id).as("__topk"))
    g.select(groupCols.map(col) :+ posexplode(col("__topk")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).as("rank"),
        col("col._2").as("id"),
        col("col._1").as("score")): _*)
  }

  /** DuckDB oracle for [[perGroup]] — the window formulation the aggregate
    * is provably equivalent to.
    */
  def perGroupOracle(table: String, groupCols: Seq[String], scoreSql: String,
                     idSql: String, k: Int): String = {
    val g = groupCols.mkString(", ")
    // the IS NOT NULL filter encodes perGroup's drop-nulls contract — a
    // bare window form would rank NULL scores last instead of skipping them
    s"""SELECT $g, CAST(row_number() OVER w AS BIGINT) AS rank,
  CAST($idSql AS BIGINT) AS id, CAST($scoreSql AS DOUBLE) AS score
FROM $table
WHERE $scoreSql IS NOT NULL AND $idSql IS NOT NULL
WINDOW w AS (PARTITION BY $g ORDER BY $scoreSql DESC, $idSql ASC)
QUALIFY row_number() OVER w <= $k
ORDER BY $g, rank""".stripMargin
  }
}
