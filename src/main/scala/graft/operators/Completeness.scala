package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column completeness monitoring by time window — the data-quality
  * trend line behind every ingestion dashboard: for each day and each
  * watched column, how many rows arrived and how many had the column NULL.
  * A schema change upstream, a broken extractor, or a partial outage shows
  * up as a step in one column's null rate long before a downstream job
  * crashes on it; paired with [[DenseSeries.denseDaily]] the missing days
  * themselves become visible too.
  *
  * Scale shape: ONE partial-agg'd aggregate over the scan — per day, a
  * row count plus one `count(col)` per watched column (all map-side
  * combined), then a scan-stage explode into the long (day, column) form.
  * Output is days × columns whatever the row count; no second pass, no
  * join, no window. The [[Profiling.tableProfile]] shape pointed at
  * NULL-rate trending instead of cardinality.
  *
  * `null_bp` is basis points (⌊null·10⁴/rows⌋ — integer floor division on
  * non-negatives, engine-exact). Rows with a NULL timestamp have no day
  * to land on and drop (monitor them via a constant-day call if needed).
  * Column aliases are positional, so dotted column names are safe (the
  * tableProfile discipline).
  */
object Completeness {

  /** (day, col_name, n_rows, n_null, null_bp) per day × watched column. */
  def daily(df: DataFrame, tsCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to watch")
    val aggs = cols.zipWithIndex.map { case (c, i) =>
      count(col(s"`$c`")).as(s"__nn_$i")
    }
    val g = df.where(col(tsCol).isNotNull)
      .groupBy(col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$i")).as("n_null"),
        expr(s"((__n - __nn_$i) * 10000) div __n").as("null_bp"))
    }: _*)
    g.select(col("day"), explode(rows).as("p"))
      .select(col("day"), col("p.col_name"), col("p.n_rows"),
        col("p.n_null"), col("p.null_bp"))
  }

  /** DuckDB replay of [[daily]]: one grouped aggregate over `fromSql`
    * (a FROM-able relation producing the same columns), unstacked with a
    * per-column UNION ALL.
    */
  def dailyOracle(fromSql: String, tsCol: String, cols: Seq[String]): String = {
    val counts = cols.zipWithIndex
      .map { case (c, i) => s"count($c) AS nn_$i" }.mkString(", ")
    val parts = cols.zipWithIndex.map { case (c, i) =>
      s"""SELECT day, '$c' AS col_name, n AS n_rows, n - nn_$i AS n_null,
  ((n - nn_$i) * 10000) // n AS null_bp FROM g"""
    }.mkString("\nUNION ALL ")
    s"""WITH e AS ($fromSql),
g AS (SELECT CAST($tsCol AS DATE) AS day, count(*) AS n, $counts
  FROM e WHERE $tsCol IS NOT NULL GROUP BY 1)
$parts
ORDER BY day, col_name""".stripMargin
  }
}
