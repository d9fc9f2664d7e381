package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximum drawdown — the peak-to-trough risk readout over a level
  * series (account balance, cumulative PnL, inventory on hand, live
  * connection count): dd(t) = max(v₀..vₜ) − vₜ, and max-drawdown is the
  * deepest such dip. The question it answers — "how far below its own
  * high-water mark did this series ever fall" — is what capacity
  * planning, treasury risk, and SLO burn reviews actually ask, and no
  * plain aggregate (min, max, variance) can see it because it is
  * ORDER-dependent.
  *
  * Exact semantics: values are integral (the [[graft.Guards]] Drift
  * rule), the running maximum and every dd(t) are exact Long arithmetic
  * (no division anywhere — drawdown is gate-grade by construction), and
  * the reported `trough_idx` is the EARLIEST index achieving the maximum
  * drawdown (ties pinned by one `max(struct(dd, −idx))` election, the
  * [[Mode]] device). Duplicate indexes raise in-plan — "the level at t"
  * must be a function, and a running max over an ambiguous order would
  * silently pick one (detected via `lag` on the SAME window, no extra
  * shuffle). A degenerate single-point series reports dd = 0 honestly.
  *
  * Scale shape: one per-group ordered window (running max + lag dup
  * probe share it) then one partial-agg'd group collapse. The window
  * sorts each group in one task — the [[ExpSmooth]] calendar-series
  * contract — so groups above `maxPoints` raise loudly inside the plan
  * (the [[TheilSen]] discipline) riding BOTH published columns.
  */
object Drawdown {

  /** One row per group: (groupCol, n, peak, max_dd, trough_idx). Rows
    * with NULL idx/value drop; NULL groups are a real stratum; `peak` is
    * the all-time high, `max_dd >= 0` always (0 ⇔ the series never dips
    * below its running high).
    */
  def maxDrawdown(df: DataFrame, groupCol: String, idxCol: String,
                  valueCol: String, maxPoints: Long = 1000000L): DataFrame = {
    graft.Guards.requireIntegral(df, idxCol, "maxDrawdown")
    graft.Guards.requireIntegral(df, valueCol, "maxDrawdown")
    require(maxPoints >= 1, s"maxPoints must be >= 1, got $maxPoints")
    val rows = df
      .where(col(idxCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(idxCol).cast("long").as("__t"),
        col(valueCol).cast("long").as("__v"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__t"))
    val marked = rows
      .withColumn("__dup", lag(col("__t"), 1).over(w) === col("__t"))
      .withColumn("__dd",
        max(col("__v")).over(w.rowsBetween(Window.unboundedPreceding, 0)) -
          col("__v"))
    val agg = marked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(coalesce(col("__dup"), lit(false))).as("__anyDup"),
        max(col("__v")).as("peak"),
        max(struct(col("__dd"), (-col("__t")).as("__nt"))).as("__best"))
    def guarded(out: org.apache.spark.sql.Column) =
      when(col("__anyDup"), raise_error(concat(
        lit("maxDrawdown: duplicate idx within group '"),
        col(groupCol).cast("string"),
        lit("' — the level at t must be a function; pre-aggregate to one row per (group, idx)")))
        .cast("long"))
        .when(col("n") > maxPoints, raise_error(concat(
          lit("maxDrawdown: group '"), col(groupCol).cast("string"),
          lit(s"' exceeds $maxPoints points — feed a calendar spine or raise maxPoints")))
          .cast("long"))
        .otherwise(out)
    agg.select(col(groupCol), col("n"), col("peak"),
      guarded(col("__best").getField("__dd")).as("max_dd"),
      guarded(-col("__best").getField("__nt")).as("trough_idx"))
  }

  /** DuckDB replay — same running-max window, two-level arg-min for the
    * earliest trough (result-equal to the struct election). `seriesSql`
    * yields (grp, t, v), one row per (grp, t).
    */
  def oracleSql(seriesSql: String, groupName: String): String =
    s"""WITH s AS (SELECT grp, t, v FROM ($seriesSql)
  WHERE t IS NOT NULL AND v IS NOT NULL),
d AS (SELECT grp, t, v,
    max(v) OVER (PARTITION BY grp ORDER BY t ROWS UNBOUNDED PRECEDING) - v AS dd
  FROM s),
m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, max(v) AS peak,
    max(dd) AS mdd FROM d GROUP BY grp)
SELECT m.grp AS $groupName, m.n, CAST(m.peak AS BIGINT) AS peak,
  CAST(m.mdd AS BIGINT) AS max_dd, min(d.t) AS trough_idx
FROM m JOIN d ON m.grp IS NOT DISTINCT FROM d.grp AND d.dd = m.mdd
GROUP BY m.grp, m.n, m.peak, m.mdd ORDER BY m.grp"""
}
