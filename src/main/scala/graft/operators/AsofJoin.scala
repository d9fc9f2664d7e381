package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the most recent right row with
  * the same key and `ts` at-or-before the left row's `ts`. The reference has
  * no such operator (its joins are pure equi-joins, sql_adt.rs:688-736); this
  * is a training-data-pipeline extension: align events/features to the latest
  * observation ("what was the last click before this purchase").
  *
  * Spark has no asof join either, and the naive encodings don't scale:
  *  - inequality join → BroadcastNestedLoop / cartesian (O(n·m) per key);
  *  - per-left-row subquery → one shuffle per probe.
  *
  * This implementation is a single-shuffle union + running-window pass:
  * tag right rows 0 / left rows 1, union them on a shared layout, then
  * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side ROWS
  * UNBOUNDED PRECEDING..CURRENT)` carries the latest right payload forward
  * into each left row. Cost = one hash shuffle of |L|+|R| rows on the key +
  * one in-partition sort — the same exchange a sort-merge join would pay,
  * with no build/probe and no range explosion; skew and memory behavior are
  * those of a plain window, so the plan survives a 100× scale-up unchanged.
  *
  * The right payload travels as ONE struct column, so all matched values come
  * from the SAME right row (per-column `last(ignoreNulls)` would mix rows
  * when a payload cell is null). At equal `ts` the side flag breaks the tie:
  * inclusive (>=) sorts right rows first so they are visible to the left row;
  * strict (>) sorts them after. Among multiple right rows sharing (key, ts)
  * the winner follows sort order (non-deterministic); give `tieBreak` a
  * column (e.g. an event id) to make it total.
  */
object AsofJoin {

  /** @param on       equi-key columns (present in both frames)
    * @param ts       ordering column (same name and comparable type in both)
    * @param payload  right columns to carry onto matched left rows
    * @param suffix   appended to payload names on output (collision escape)
    * @param strict   false = match ts_r <= ts_l (ASOF's usual >=); true = ts_r < ts_l
    * @param tieBreak extra right-side ordering column for duplicate (key, ts)
    */
  def asofBackward(left: DataFrame, right: DataFrame, on: Seq[String], ts: String,
                   payload: Seq[String], suffix: String = "",
                   strict: Boolean = false, tieBreak: Option[String] = None): DataFrame =
    asofImpl(left, right, on, ts, payload, suffix, strict, tieBreak, forward = false)

  /** As-of FORWARD join — for each left row, the EARLIEST right row with the
    * same key and `ts` at-or-after the left row's `ts` ("what was the next
    * click after this impression"). Identical single-shuffle union+window
    * machinery as [[asofBackward]] with the window ordered descending, so
    * the running `last(ignoreNulls)` carries the smallest eligible right
    * `ts` back onto each left row; same cost profile.
    */
  def asofForward(left: DataFrame, right: DataFrame, on: Seq[String], ts: String,
                  payload: Seq[String], suffix: String = "",
                  strict: Boolean = false, tieBreak: Option[String] = None): DataFrame =
    asofImpl(left, right, on, ts, payload, suffix, strict, tieBreak, forward = true)

  /** Staleness-bounded as-of — the feature-store correctness knob on top
    * of [[asofBackward]]: a match older than `maxGap` is WORSE than no
    * match ("yesterday's price is not this trade's price"), so payloads
    * from matches with ts_l − ts_r > maxGap are blanked to NULL while the
    * row survives (the caller sees "no fresh feature", not a silently
    * stale one). `maxGap` compares against the ts difference — an
    * INTERVAL literal for timestamp columns, a numeric for numeric ts.
    * Same single-shuffle machinery; the bound is a scan-stage post-filter
    * on the carried match ts.
    */
  def asofBackwardWithin(left: DataFrame, right: DataFrame, on: Seq[String],
                         ts: String, payload: Seq[String], maxGap: Column,
                         suffix: String = "", strict: Boolean = false,
                         tieBreak: Option[String] = None): DataFrame = {
    // the inner asofImpl call only sees the internal suffix, so re-apply
    // its collision guard against the FINAL output names
    // the bound rides on an internal carry of the match ts (payload :+ ts);
    // a payload already naming ts would duplicate that carry and fail with
    // an ambiguous-column error far from this API — the match ts is carried
    // regardless, so listing it is never needed
    require(!payload.contains(ts),
      s"payload must not contain the ts column '$ts' in the Within variants")
    val clash = payload.map(_ + suffix).toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"asof payload collides with left columns: $clash (use suffix)")
    val mts = ts + "__asof_m"
    val joined = asofImpl(left, right, on, ts, payload :+ ts,
      suffix = "__asof_m", strict = strict, tieBreak = tieBreak, forward = false)
    val fresh = col(mts).isNotNull && (col(ts) - col(mts)) <= maxGap
    joined.select(left.columns.map(col).toIndexedSeq ++
      payload.map { p =>
        when(fresh, col(p + "__asof_m")).as(p + suffix)
      }: _*)
  }

  /** Forward twin of [[asofBackwardWithin]]: the next right row at-or-
    * after, blanked when it arrives later than `maxGap` — "the click
    * within the 30-minute conversion window", with beyond-window matches
    * reading as no-conversion rather than silently attributing.
    */
  def asofForwardWithin(left: DataFrame, right: DataFrame, on: Seq[String],
                        ts: String, payload: Seq[String], maxGap: Column,
                        suffix: String = "", strict: Boolean = false,
                        tieBreak: Option[String] = None): DataFrame = {
    require(!payload.contains(ts),
      s"payload must not contain the ts column '$ts' in the Within variants")
    val clash = payload.map(_ + suffix).toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"asof payload collides with left columns: $clash (use suffix)")
    val mts = ts + "__asof_m"
    val joined = asofImpl(left, right, on, ts, payload :+ ts,
      suffix = "__asof_m", strict = strict, tieBreak = tieBreak, forward = true)
    val fresh = col(mts).isNotNull && (col(mts) - col(ts)) <= maxGap
    joined.select(left.columns.map(col).toIndexedSeq ++
      payload.map { p =>
        when(fresh, col(p + "__asof_m")).as(p + suffix)
      }: _*)
  }

  /** DuckDB oracle for [[asofForwardWithin]]. */
  def asofForwardWithinOracle(table: String, leftPred: String, rightPred: String,
                              key: String, ts: String, leftCols: Seq[String],
                              payload: Seq[(String, String)], maxGapSql: String,
                              tieBreak: Option[String] = None): String =
    asofOracleImpl(table, leftPred, rightPred, key, ts, leftCols, tieBreak,
      joinOp = "<=",
      rsel = payload.map { case (c, a) =>
        s"CASE WHEN r.$ts - l.$ts <= $maxGapSql THEN r.$c END AS $a"
      })

  /** Nearest-as-of join: the right row minimizing |ts_r − ts_l| per key,
    * ties (including an exact-ts match vs an equidistant future row)
    * preferring the backward side. Composed as backward + forward passes
    * (each one shuffle) and a per-row pick — no distance join, no
    * candidate explosion; `ts` needs only subtraction + comparison
    * (numerics and timestamps both qualify).
    */
  def asofNearest(left: DataFrame, right: DataFrame, on: Seq[String], ts: String,
                  payload: Seq[String], suffix: String = "",
                  tieBreak: Option[String] = None): DataFrame = {
    val payB = payload.map(_ + "__b"); val payF = payload.map(_ + "__f")
    val tsB = ts + "__b"; val tsF = ts + "__f"
    val b = asofBackward(left, right, on, ts, payload :+ ts, suffix = "__b",
      strict = false, tieBreak = tieBreak)
    val bf = asofForward(b, right, on, ts, payload :+ ts, suffix = "__f",
      strict = false, tieBreak = tieBreak)
    val pickBack = col(tsF).isNull ||
      (col(tsB).isNotNull && (col(ts) - col(tsB)) <= (col(tsF) - col(ts)))
    bf.select(left.columns.map(col).toIndexedSeq ++
      payload.indices.map { i =>
        when(pickBack, col(payB(i))).otherwise(col(payF(i))).as(payload(i) + suffix)
      }: _*)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, on: Seq[String], ts: String,
                       payload: Seq[String], suffix: String,
                       strict: Boolean, tieBreak: Option[String],
                       forward: Boolean): DataFrame = {
    require(on.nonEmpty, "asof join needs at least one key column")
    val outNames = payload.map(_ + suffix)
    val clash = outNames.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asof payload collides with left columns: $clash (use suffix)")

    val pay = "__asof_pay"; val side = "__asof_side"; val tie = "__asof_tie"
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val leftOnly = left.columns.filterNot(c => on.contains(c) || c == ts)
    val leftSchema = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val rightU = right.select(
      on.map(col) ++ Seq(
        col(ts),
        lit(rightSide).as(side),
        tieBreak.map(col).getOrElse(lit(0L).cast("long")).cast("long").as(tie),
        struct(payload.map(col): _*).as(pay)) ++
      leftOnly.map(c => lit(null).cast(leftSchema(c)).as(c)): _*)
    val leftU = left.select(
      on.map(col) ++ Seq(
        col(ts),
        lit(leftSide).as(side),
        lit(Long.MaxValue).as(tie), // left rows order after right ties at the same (ts, side)
        lit(null).cast(rightU.schema(pay).dataType).as(pay)) ++
      leftOnly.map(col): _*)

    // forward flips only the ts direction: processing right-to-left, the
    // running last() then carries the SMALLEST eligible right ts; the side
    // flag keeps equal-ts visibility identical in both directions
    val tsOrder = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(tsOrder, col(side).asc, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightU.unionByName(leftU)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .where(col(side) === leftSide)
      .select(left.columns.map(col).toIndexedSeq ++
        payload.zip(outNames).map { case (p, o) => col(s"$pay.$p").as(o) }: _*)
  }

  /** DuckDB oracle builder for the gate: native ASOF LEFT JOIN, whose
    * greatest-ts_r-≤-ts_l semantics are exactly `asofBackward(strict=false)`.
    * ASOF leaves the pick among right rows TIED on (key, ts) unspecified, so
    * when `tieBreak` is given the right side is pre-deduplicated to the
    * max-tieBreak row per (key, ts) — the engine's pinned winner.
    */
  def asofOracle(table: String, leftPred: String, rightPred: String,
                 key: String, ts: String, leftCols: Seq[String],
                 payload: Seq[(String, String)], tieBreak: Option[String] = None): String =
    asofOracleImpl(table, leftPred, rightPred, key, ts, leftCols, tieBreak,
      joinOp = ">=",
      rsel = payload.map { case (c, a) => s"r.$c AS $a" })

  /** DuckDB oracle for [[asofBackwardWithin]] — the same native ASOF JOIN
    * with each payload wrapped in the staleness CASE.
    */
  def asofWithinOracle(table: String, leftPred: String, rightPred: String,
                       key: String, ts: String, leftCols: Seq[String],
                       payload: Seq[(String, String)], maxGapSql: String,
                       tieBreak: Option[String] = None): String =
    asofOracleImpl(table, leftPred, rightPred, key, ts, leftCols, tieBreak,
      joinOp = ">=",
      rsel = payload.map { case (c, a) =>
        s"CASE WHEN l.$ts - r.$ts <= $maxGapSql THEN r.$c END AS $a"
      })

  /** Shared ASOF oracle scaffolding (left filter, tie-break pre-dedup,
    * join direction) — one copy of the QUALIFY rule for every variant.
    */
  private def asofOracleImpl(table: String, leftPred: String, rightPred: String,
                             key: String, ts: String, leftCols: Seq[String],
                             tieBreak: Option[String], joinOp: String,
                             rsel: Seq[String]): String = {
    val lsel = leftCols.map(c => s"l.$c AS $c").mkString(", ")
    val rightSrc = tieBreak match {
      case Some(tb) => s"SELECT * FROM $table WHERE $rightPred QUALIFY " +
        s"row_number() OVER (PARTITION BY $key, $ts ORDER BY $tb DESC) = 1"
      case None => s"SELECT * FROM $table WHERE $rightPred"
    }
    s"SELECT $lsel, ${rsel.mkString(", ")} FROM (SELECT * FROM $table WHERE $leftPred) l " +
      s"ASOF LEFT JOIN ($rightSrc) r ON l.$key = r.$key AND l.$ts $joinOp r.$ts"
  }

  /** DuckDB oracle for [[asofForward]]: native ASOF LEFT JOIN with the
    * inequality flipped (`l.ts <= r.ts` picks the smallest at-or-after).
    */
  def asofForwardOracle(table: String, leftPred: String, rightPred: String,
                        key: String, ts: String, leftCols: Seq[String],
                        payload: Seq[(String, String)], tieBreak: Option[String] = None): String =
    asofOracleImpl(table, leftPred, rightPred, key, ts, leftCols, tieBreak,
      joinOp = "<=",
      rsel = payload.map { case (c, a) => s"r.$c AS $a" })

  /** DuckDB oracle for [[asofNearest]]: brute left join + QUALIFY picking
    * the min-|Δts| right row, backward side preferred on ties — the
    * textbook definition, independent of the two-pass composition.
    * `leftId` must uniquely identify left rows.
    */
  def asofNearestOracle(table: String, leftPred: String, rightPred: String,
                        key: String, ts: String, leftId: String, leftCols: Seq[String],
                        payload: Seq[(String, String)], tieBreak: Option[String] = None): String = {
    val lsel = leftCols.map(c => s"l.$c AS $c").mkString(", ")
    val rsel = payload.map { case (c, a) => s"r.$c AS $a" }.mkString(", ")
    val rightSrc = tieBreak match {
      case Some(tb) => s"SELECT * FROM $table WHERE $rightPred QUALIFY " +
        s"row_number() OVER (PARTITION BY $key, $ts ORDER BY $tb DESC) = 1"
      case None => s"SELECT * FROM $table WHERE $rightPred"
    }
    s"""SELECT $lsel, $rsel FROM (SELECT * FROM $table WHERE $leftPred) l
LEFT JOIN ($rightSrc) r ON l.$key = r.$key
QUALIFY r.$key IS NULL OR row_number() OVER (PARTITION BY l.$leftId
  ORDER BY CASE WHEN r.$ts <= l.$ts THEN l.$ts - r.$ts ELSE r.$ts - l.$ts END ASC,
           CASE WHEN r.$ts <= l.$ts THEN 0 ELSE 1 END ASC) = 1""".stripMargin
  }
}
