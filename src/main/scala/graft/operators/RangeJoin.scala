package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — pair each left row (a point `ts`) with every
  * right row whose `[start, end)` interval contains it, optionally also
  * matching equi-keys. Another operator the reference lacks (equi-joins
  * only) and Spark plans poorly: a raw `l.ts >= r.start && l.ts < r.end`
  * condition has no equi-part, so Catalyst falls back to
  * BroadcastNestedLoopJoin — O(|L|·|R|) compares and a broadcast that dies
  * at scale.
  *
  * Scale encoding: overlap bucketing. Quantize time into `bucket`-wide
  * cells; a point belongs to exactly ONE cell, an interval covers
  * `ceil(len/bucket)+1` cells, so exploding the RIGHT side by covered cell
  * and equi-joining on (keys…, cell) turns the range predicate into a hash
  * join + residual filter. Cost: |R| inflates by the mean interval/bucket
  * ratio — choose `bucket` near the typical interval length so the blowup
  * is a small constant; every pair lands in exactly one joint cell (the
  * point's), so no post-join dedup is needed.
  *
  * All arithmetic is integer (micros since epoch DIV bucket), portable to
  * any engine — the differential oracle replays a plain inequality join.
  */
object RangeJoin {

  /** @param left      point side; `tsCol` must be a TIMESTAMP/TIMESTAMP_NTZ column
    * @param right     interval side with `startCol`/`endCol` of the same type
    * @param on        extra equi-key pairs (leftCol -> rightCol), may be empty
    * @param bucket    cell width; choose ≈ the typical interval length
    * @param halfOpen  true: match `start <= ts < end` (the default,
    *                  window-semantics); false: closed `start <= ts <= end`
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   tsCol: String, startCol: String, endCol: String,
                   on: Seq[(String, String)] = Nil,
                   bucket: String = "1 hour",
                   halfOpen: Boolean = true): DataFrame = {
    val cell = "__rj_cell"
    // integer cell id: micros-since-epoch DIV bucket-micros
    def cellOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / bucketMicros(bucket))

    // single-split scans (the bench fixture layout) serialize the whole
    // explode+join into one task — fan out to parallelism first (a no-op
    // whenever the input already has >= cores partitions, i.e. at scale)
    val l = graft.Guards.fanOut(left).withColumn(cell, cellOf(col(tsCol)))
    val r = graft.Guards.fanOut(right).withColumn(cell,
      explode(sequence(cellOf(col(startCol)), cellOf(col(endCol)))))
    val residual =
      if (halfOpen) col(tsCol) >= col(startCol) && col(tsCol) < col(endCol)
      else col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol)
    l.join(r, l(cell) === r(cell) &&
        on.map { case (a, b) => l(a) === r(b) }.foldLeft(residual)(_ && _))
      .drop(cell)
  }

  /** Micros per bucket, parsed from a "N unit" duration string. */
  def bucketMicros(bucket: String): Long = {
    val Array(n, unit) = bucket.trim.split("\\s+", 2)
    val base = unit.toLowerCase match {
      case u if u.startsWith("second") => 1000000L
      case u if u.startsWith("minute") => 60L * 1000000L
      case u if u.startsWith("hour")   => 3600L * 1000000L
      case u if u.startsWith("day")    => 86400L * 1000000L
      case u => throw new IllegalArgumentException(s"unsupported bucket unit: $u")
    }
    n.toLong * base
  }

  /** DuckDB oracle: the plain inequality join (fine at oracle scale). */
  def intervalOracle(leftSql: String, rightSql: String,
                     tsCol: String, startCol: String, endCol: String,
                     on: Seq[(String, String)], selectSql: String,
                     halfOpen: Boolean = true): String = {
    val endOp = if (halfOpen) "<" else "<="
    val keys = on.map { case (a, b) => s"l.$a = r.$b" }
    val conds = (keys :+ s"l.$tsCol >= r.$startCol" :+ s"l.$tsCol $endOp r.$endCol").mkString(" AND ")
    s"SELECT $selectSql FROM ($leftSql) l JOIN ($rightSql) r ON $conds"
  }

  /** Interval × interval OVERLAP join — pair rows whose `[start, end)`
    * windows intersect (optionally under equi-keys). The raw
    * `la < rb && ra < lb` condition has no equi-part, so Catalyst would
    * nested-loop it; here BOTH sides explode into covered grid cells and
    * equi-join on the cell. A pair sharing k cells would emit k times —
    * instead of a post-join distinct (a full-output shuffle), each pair is
    * kept only in its FIRST JOINT cell, `max(cell(leftStart),
    * cell(rightStart))`: if the intervals overlap, the later start lies
    * inside both windows, so both sides cover that cell — exactly-once
    * emission by pure arithmetic.
    *
    * Cost: each side inflates by ceil(len/bucket)+1 — choose `bucket`
    * near the typical interval length; the residual predicate removes
    * same-cell non-overlaps.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  leftStart: String, leftEnd: String,
                  rightStart: String, rightEnd: String,
                  on: Seq[(String, String)] = Nil,
                  bucket: String = "1 day",
                  halfOpen: Boolean = true): DataFrame = {
    val cell = "__oj_cell"
    def cellOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / bucketMicros(bucket))
    // same single-split fan-out posture as intervalJoin (no-op at scale)
    val l = graft.Guards.fanOut(left).withColumn(cell, explode(
      sequence(cellOf(col(leftStart)), cellOf(col(leftEnd)))))
    val r = graft.Guards.fanOut(right).withColumn(cell, explode(
      sequence(cellOf(col(rightStart)), cellOf(col(rightEnd)))))
    val overlap =
      if (halfOpen) l(leftStart) < r(rightEnd) && r(rightStart) < l(leftEnd)
      else l(leftStart) <= r(rightEnd) && r(rightStart) <= l(leftEnd)
    val firstJoint = greatest(cellOf(l(leftStart)), cellOf(r(rightStart)))
    l.join(r, l(cell) === r(cell) &&
        on.map { case (a, b) => l(a) === r(b) }
          .foldLeft(overlap && l(cell) === firstJoint)(_ && _))
      .drop(cell)
  }

  /** DuckDB oracle for [[overlapJoin]] — the plain inequality form. */
  def overlapOracle(leftSql: String, rightSql: String,
                    leftStart: String, leftEnd: String,
                    rightStart: String, rightEnd: String,
                    on: Seq[(String, String)], selectSql: String,
                    halfOpen: Boolean = true): String = {
    val op = if (halfOpen) "<" else "<="
    val keys = on.map { case (a, b) => s"l.$a = r.$b" }
    val conds = (keys :+ s"l.$leftStart $op r.$rightEnd" :+
      s"r.$rightStart $op l.$leftEnd").mkString(" AND ")
    s"SELECT $selectSql FROM ($leftSql) l JOIN ($rightSql) r ON $conds"
  }
}
