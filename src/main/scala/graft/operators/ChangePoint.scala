package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mean-shift scan — the exact-integer CUSUM-family statistic for "did
  * this series change level, and where": for a per-group series x₁..x_n
  * (total order (ts, id)), the cumulative deviation from a constant-mean
  * fit is `D_i = n·P_i − i·T` (P_i prefix sum, T total) — zero everywhere
  * for a flat series, a tent peaking AT the shift point for a step
  * change. The reported `split_i` (the i maximizing |D_i|, ties to the
  * earliest) is the maximum-likelihood change point for a mean shift; the
  * magnitude ranks series by how decisively they changed.
  *
  * Everything is integers: `n·P_i − i·T` is cross-multiplication, exact
  * in DECIMAL(38,0) whatever the magnitudes (the statistic is n·Σx-scaled
  * — divide by n·n downstream if a per-unit number is wanted); the max
  * and its position come from ONE `max(struct(dev, −i))` partial-agg'd
  * reduction — no second window.
  *
  * Scale shape: one per-group rank window (prefix sums — the
  * rank-normalize wall-clock posture) + a group-sized totals join + one
  * reduction. `max_dev` is emitted as BIGINT (cross-engine hashable; an
  * over-BIGINT-range statistic throws loudly under ANSI rather than
  * silently rescaling — pre-scale the values down if that fires).
  */
object ChangePoint {

  /** (groupCol, n_samples, max_dev, split_i) per group — `split_i` is the
    * 1-based prefix length with the maximal absolute deviation.
    */
  def meanShiftScan(df: DataFrame, groupCol: String, tsCol: String,
                    valueCol: String, idCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, valueCol, "meanShiftScan")
    val rows = df
      .where(col(tsCol).isNotNull && col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol), col(tsCol).as("__ts"), col(idCol).as("__id"),
        col(valueCol).cast(LongType).as("__x"))
    val ord = Window.partitionBy(col(groupCol)).orderBy(col("__ts"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rn = Window.partitionBy(col(groupCol)).orderBy(col("__ts"), col("__id"))
    val pre = rows
      .withColumn("__i", row_number().over(rn).cast(LongType))
      .withColumn("__p", graft.ExactSum.sumLongOver(col("__x"), ord))
    val totals = rows.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_samples"),
      graft.ExactSum.sumLong(col("__x")).as("__tot"))
    pre.join(broadcast(totals), Seq(groupCol))
      .withColumn("__dev",
        abs(col("n_samples").cast("decimal(38,0)") * col("__p")
          - col("__i").cast("decimal(38,0)") * col("__tot")))
      .groupBy(col(groupCol))
      .agg(max(col("n_samples")).as("n_samples"),
        max(struct(col("__dev").as("d"), (-col("__i")).as("ni"))).as("__m"))
      .select(col(groupCol), col("n_samples"),
        col("__m.d").cast(LongType).as("max_dev"),
        (-col("__m.ni")).as("split_i"))
  }

  /** DuckDB replay of [[meanShiftScan]] — same total order, same
    * cross-multiplied decimal deviation, earliest-i tiebreak.
    */
  def oracleSql(table: String, groupCol: String, tsCol: String,
                valueSql: String, idCol: String): String =
    s"""WITH r AS (SELECT $groupCol, $tsCol AS ts, $idCol AS id,
    CAST($valueSql AS BIGINT) AS x
  FROM $table
  WHERE $tsCol IS NOT NULL AND ($valueSql) IS NOT NULL AND $idCol IS NOT NULL),
w AS (SELECT $groupCol,
    row_number() OVER (PARTITION BY $groupCol ORDER BY ts, id) AS i,
    sum(CAST(x AS DECIMAL(38,0))) OVER (PARTITION BY $groupCol ORDER BY ts, id
      ROWS UNBOUNDED PRECEDING) AS p
  FROM r),
t AS (SELECT $groupCol, count(*) AS n, sum(CAST(x AS DECIMAL(38,0))) AS tot
  FROM r GROUP BY 1),
d AS (SELECT w.$groupCol, w.i,
    abs(CAST(t.n AS DECIMAL(38,0)) * w.p - CAST(w.i AS DECIMAL(38,0)) * t.tot) AS dev,
    t.n
  FROM w JOIN t ON w.$groupCol = t.$groupCol),
m AS (SELECT $groupCol, max(dev) AS md FROM d GROUP BY 1)
SELECT d.$groupCol, CAST(max(d.n) AS BIGINT) AS n_samples,
  CAST(max(m.md) AS BIGINT) AS max_dev,
  CAST(min(d.i) AS BIGINT) AS split_i
FROM d JOIN m ON d.$groupCol = m.$groupCol AND d.dev = m.md
GROUP BY d.$groupCol
ORDER BY d.$groupCol""".stripMargin
}
