package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Recency decay in exact integer arithmetic — halve a score once per
  * elapsed half-life: `decayed = score >> min(62, age/halfLife)`. The
  * freshness weighting behind news/code corpus sampling ("prefer recent
  * documents"), trending detection, and staleness-aware dedup keep-best —
  * expressed with a bit shift instead of `score · 0.5^(age/h)` so the
  * result is bit-identical on any engine and partitioning (the float form
  * is not: pow/exp differ across math libraries; sums of floats differ by
  * order). The step-wise decay (piecewise-constant per half-life) is the
  * price; corpus weighting doesn't need sub-half-life smoothness.
  *
  * Negative ages (timestamps after `asOf`) clamp to shift 0 — the future
  * doesn't boost. Scores must be non-negative (shift on negatives is
  * implementation-defined semantics-wise; a require guards the literal
  * misuse in specs, and NULL score/ts rows pass through as NULL).
  *
  * Scale shape: pure scan-stage column arithmetic — no shuffle, no
  * state, composable under any aggregate (sum of decayed longs is itself
  * order-independent).
  */
object DecayScore {

  /** `score >> min(62, max(0, days(asOf − dateCol) / halfLifeDays))` as a
    * column; `score` must be a non-negative integer column.
    */
  def decayedByDays(score: Column, dateCol: Column, asOfDate: String,
                    halfLifeDays: Int): Column = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive, got $halfLifeDays")
    val age = datediff(lit(asOfDate).cast("date"), dateCol.cast("date"))
    // age/h in double is exact for any plausible day count (≪ 2^52), so
    // floor gives the exact integer quotient; clamp AFTER floor so a
    // future-dated row (negative age) lands on shift 0
    val shifts = least(lit(62), greatest(lit(0), floor(age / lit(halfLifeDays))))
    // the Scala shiftright wrapper only takes a literal distance; the SQL
    // function accepts a column — call it directly. NULL handling is
    // explicit: Spark's greatest() IGNORES nulls (a NULL age would clamp
    // to shift 0 and silently emit the undecayed score), and engines
    // disagree on greatest-with-NULL — so an unrankable row is nulled by
    // hand on both sides
    when(score.isNull || age.isNull, lit(null).cast(LongType))
      .otherwise(call_function("shiftright", score.cast(LongType), shifts.cast("int")))
  }

  /** Table form: input plus `decayed`. */
  def withDecay(df: DataFrame, scoreCol: String, dateCol: String,
                asOfDate: String, halfLifeDays: Int): DataFrame =
    df.withColumn("decayed",
      decayedByDays(col(scoreCol), col(dateCol), asOfDate, halfLifeDays))

  /** DuckDB replay: same integer age/shift arithmetic (`>>` on BIGINT). */
  def oracleSql(table: String, scoreSql: String, dateSql: String,
                asOfDate: String, halfLifeDays: Int, keepCols: Seq[String]): String = {
    val cols = keepCols.mkString(", ")
    val shifts = s"least(62, greatest(0, date_diff('day', CAST($dateSql AS DATE), DATE '$asOfDate') // $halfLifeDays))"
    // no ORDER BY: keepCols may carry aliased expressions, and the
    // differential gate canonicalizes row order anyway. NULL explicit —
    // engines disagree on greatest() over NULLs
    s"""SELECT $cols,
  CASE WHEN ($scoreSql) IS NULL OR ($dateSql) IS NULL THEN NULL
       ELSE CAST(($scoreSql) >> $shifts AS BIGINT) END AS decayed
FROM $table""".stripMargin
  }
}
