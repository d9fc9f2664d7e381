package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, minimize both dimensions) — "no other
  * row is at-or-below on both axes with at least one strict": the
  * multi-objective filter behind price/latency frontiers, quality-vs-cost
  * corpus pruning (keep documents no other document beats on both
  * quality score and toxicity), and candidate shortlisting.
  *
  * Algorithm: a row (x, y) survives iff
  *   (a) y = min(y) among its own x (rows tied on BOTH axes all survive —
  *       neither strictly dominates the other), and
  *   (b) y < min(y') over all x' < x (any at-or-below y at a strictly
  *       smaller x dominates).
  * Both conditions reduce to ONE tiny frame: the per-x minima. The
  * corpus-width work is a single groupBy(x) aggregate; the running
  * strict-prefix minimum runs over the per-x frame — bounded by the
  * DOMAIN of x (dates, price bands: thousands of rows), not the row
  * count, the same bounded-derived-frame discipline as
  * [[graft.text.Packing]]'s bucket totals — and broadcast-joins back.
  * No corpus-width window, no quadratic dominance join, everything
  * integer/order comparisons (bit-identical cross-engine).
  *
  * Reference scope note: fabrix has no multi-objective operators —
  * extension surface beside the analytics family ([[Profiling]],
  * [[Retention]]).
  */
object Skyline {

  /** Rows of `df` on the minimize-(xCol, yCol) skyline. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol).as("__x"))
      .agg(min(col(yCol)).as("__miny"))
    // strict-prefix running min over the per-x frame (domain-bounded);
    // single-partition by construction, like Packing's bucket totals
    val w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__runmin", min(col("__miny")).over(w))
      .where(col("__runmin").isNull || col("__miny") < col("__runmin"))
      .select(col("__x"), col("__miny"))
    df.join(broadcast(frontier),
        df(xCol) === col("__x") && df(yCol) === col("__miny"))
      .drop("__x", "__miny")
  }

  /** DuckDB replay of [[skyline2d]] — the same per-x minima + strict-
    * prefix running-min formulation (NOT the quadratic NOT EXISTS, so the
    * oracle replays the semantics at any scale).
    */
  def oracleSql(table: String, xCol: String, yCol: String,
                selectCols: Seq[String]): String =
    s"""WITH perx AS (SELECT $xCol AS x, min($yCol) AS miny FROM $table GROUP BY $xCol),
run AS (SELECT x, miny, min(miny) OVER
  (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmin FROM perx),
front AS (SELECT x, miny FROM run WHERE runmin IS NULL OR miny < runmin)
SELECT ${selectCols.map("t." + _).mkString(", ")}
FROM $table t JOIN front f ON t.$xCol = f.x AND t.$yCol = f.miny"""
}
