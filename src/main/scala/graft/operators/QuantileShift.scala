package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Quantile-shift table — WHERE in the distribution did two snapshots
  * diverge: a mean shift says "something moved", L286's EMD says "how
  * much mass moved"; this says WHICH PART — tail latencies regressed
  * while the median held, the P10 collapsed under a new spam wave,
  * the P90 of order value doubled. One row per declared quantile with
  * both sides' exact discrete values and their difference.
  *
  * Exact semantics: each side's quantile is the DISCRETE first
  * crossing — smallest v with qDen·cum(v) ≥ qNum·N (integer fractions;
  * 1/2 IS the median — the weightedQuantile parity law) — and ALL
  * declared quantiles read off ONE cumulative pass per side: distinct
  * (group, value) mass collapse (whale values absorb map-side), one
  * ordered window for the running count, then |qs| conditional mins in
  * a single aggregate — |qs| never multiplies the scan. Groups
  * present on only one side publish NULL for the other (full-outer,
  * null-safe — absence is a finding, not a join artifact).
  *
  * Scale residual: the per-group value window is the rank-window
  * posture (cells = distinct values, not rows); for huge value domains
  * feed bucketed values (the L143 cutpoints machinery) first.
  */
object QuantileShift {

  /** One row per (groupCol, q_num, q_den):
    * (…, v_ref, v_cur, shift = v_cur − v_ref).
    */
  def shiftTable(ref: DataFrame, cur: DataFrame, groupCol: String,
                 valueCol: String, qs: Seq[(Long, Long)]): DataFrame = {
    require(qs.nonEmpty, "qs must not be empty")
    qs.foreach { case (n, d) => require(n >= 1 && d >= 1 && n <= d,
      s"quantile $n/$d must be a fraction in (0, 1]") }
    require(qs.distinct == qs, s"duplicate quantiles in $qs")
    def side(df: DataFrame, out: String): DataFrame = {
      graft.Guards.requireIntegral(df, valueCol, "quantileShift")
      val mass = df.where(col(valueCol).isNotNull)
        .groupBy(col(groupCol), col(valueCol).cast(LongType).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val cumW = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fullW = Window.partitionBy(col(groupCol))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = mass
        .withColumn("__cw", sum(col("__c")).over(cumW))
        .withColumn("__n", sum(col("__c")).over(fullW))
      val mins = qs.zipWithIndex.map { case ((qn, qd), i) =>
        min(when(col("__cw") * qd >= col("__n") * qn, col("__v")))
          .as(s"__q$i")
      }
      val agg = cum.groupBy(col(groupCol).as(s"__g_$out"))
        .agg(mins.head, mins.tail: _*)
      val rows = qs.zipWithIndex.map { case ((qn, qd), i) =>
        struct(lit(qn).as("q_num"), lit(qd).as("q_den"),
          col(s"__q$i").as(out))
      }
      agg.select(col(s"__g_$out"), explode(array(rows: _*)).as("__r"))
        .select(col(s"__g_$out"), col("__r.q_num").as(s"__qn_$out"),
          col("__r.q_den").as(s"__qd_$out"), col(s"__r.$out").as(out))
    }
    val r = side(ref, "v_ref")
    val c = side(cur, "v_cur")
    r.join(c, col("__g_v_ref") <=> col("__g_v_cur") &&
        col("__qn_v_ref") === col("__qn_v_cur") &&
        col("__qd_v_ref") === col("__qd_v_cur"), "full_outer")
      .select(coalesce(col("__g_v_ref"), col("__g_v_cur")).as(groupCol),
        coalesce(col("__qn_v_ref"), col("__qn_v_cur")).as("q_num"),
        coalesce(col("__qd_v_ref"), col("__qd_v_cur")).as("q_den"),
        col("v_ref"), col("v_cur"),
        (col("v_cur") - col("v_ref")).as("shift"))
  }

  /** DuckDB replay; `refSql`/`curSql` each yield (grp, v). */
  def oracleSql(refSql: String, curSql: String, groupName: String,
                qs: Seq[(Long, Long)]): String = {
    val qsVals = qs.map { case (n, d) => s"($n, $d)" }.mkString(", ")
    def sideSql(src: String, out: String) =
      s"""SELECT grp, qn, qd, min(v) AS $out FROM (
    SELECT grp, v,
      sum(c) OVER (PARTITION BY grp ORDER BY v
        ROWS UNBOUNDED PRECEDING) AS cw,
      sum(c) OVER (PARTITION BY grp) AS n
    FROM (SELECT grp, v, count(*) AS c FROM ($src)
      WHERE v IS NOT NULL GROUP BY grp, v)) x
  CROSS JOIN (VALUES $qsVals) AS qs(qn, qd)
  WHERE cw * qd >= n * qn GROUP BY grp, qn, qd"""
    s"""WITH r AS (${sideSql(refSql, "v_ref")}),
c AS (${sideSql(curSql, "v_cur")})
SELECT coalesce(r.grp, c.grp) AS $groupName,
  CAST(coalesce(r.qn, c.qn) AS BIGINT) AS q_num,
  CAST(coalesce(r.qd, c.qd) AS BIGINT) AS q_den,
  r.v_ref, c.v_cur, c.v_cur - r.v_ref AS shift
FROM r FULL OUTER JOIN c
  ON r.grp IS NOT DISTINCT FROM c.grp AND r.qn = c.qn AND r.qd = c.qd
ORDER BY $groupName, q_num, q_den"""
  }
}
