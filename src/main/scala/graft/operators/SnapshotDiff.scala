package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — classify every key across two versions of a table as
  * `added` / `removed` / `changed` / `unchanged`, with the list of columns
  * that differ. The validation primitive behind incremental pipelines: a
  * maintained store ([[IncrementalAgg]], [[Scd2]], LakeMerge) claims
  * "store ≡ recompute"; diff is how that claim is audited at scale, and
  * how a bad upstream drop (yesterday's snapshot lost a partition) is
  * caught before training on it.
  *
  * Null contract: column comparison is null-safe (`<=>`) — NULL→NULL is
  * unchanged, NULL→value is a change. The key join is ALSO null-safe, so
  * one NULL-keyed row per side pairs up like any key; keys are still
  * expected unique and non-null — m NULL-keyed rows against n fan out
  * into m·n joined rows, the same blowup any duplicated key causes.
  *
  * Scale shape (100 TB): ONE hash equi-join on the key columns (full
  * outer) — both sides shuffle once on the key, or the smaller snapshot
  * broadcasts when it fits; the changed-columns array is scan-stage
  * expression work on the joined row. No window, no per-key state beyond
  * the join row. Snapshots partitioned/bucketed on the key diff with zero
  * exchange ([[graft.layout]] bucketing posture).
  */
object SnapshotDiff {

  /** One row per key present in either snapshot: key columns, `status`,
    * and `diff_cols` (alphabetical names of compared columns whose values
    * differ; empty unless status = changed). `includeUnchanged = false`
    * (the default) keeps output proportional to churn, not table size.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String], includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(true))
    val joined = o.as("o").join(n.as("n"),
      keyCols.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _), "full_outer")
    val diffCols = array(compareCols.sorted.map(c =>
      when(!(col(s"o.$c") <=> col(s"n.$c")), lit(c))): _*)
    val status = when(col("o.__in_old").isNull, lit("added"))
      .when(col("n.__in_new").isNull, lit("removed"))
      .when(size(filter(diffCols, x => x.isNotNull)) > 0, lit("changed"))
      .otherwise(lit("unchanged"))
    val out = joined.select(
      keyCols.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++ Seq(
        status.as("status"),
        // diff_cols only means something for changed rows — an added/removed
        // row trivially "differs" in every column against the absent side
        when(status === "changed", filter(diffCols, x => x.isNotNull))
          .otherwise(array().cast("array<string>")).as("diff_cols")): _*)
    if (includeUnchanged) out else out.where(col("status") =!= "unchanged")
  }

  /** DuckDB replay of [[diff]]: same full outer join, same null-safe
    * per-column comparison, diff_cols as a sorted-name list filtered the
    * same way. `oldSql` / `newSql` are subqueries producing the snapshots.
    */
  def oracleSql(oldSql: String, newSql: String, keyCols: Seq[String],
                compareCols: Seq[String], includeUnchanged: Boolean = false,
                projectSql: String = "*"): String = {
    val on = keyCols.map(k => s"o.$k IS NOT DISTINCT FROM n.$k").mkString(" AND ")
    val keys = keyCols.map(k => s"coalesce(n.$k, o.$k) AS $k").mkString(", ")
    val diffs = compareCols.sorted.map(c =>
      s"CASE WHEN NOT (o.$c IS NOT DISTINCT FROM n.$c) THEN '$c' END").mkString(", ")
    val anyDiff = compareCols.sorted.map(c =>
      s"NOT (o.$c IS NOT DISTINCT FROM n.$c)").mkString(" OR ")
    val statusExpr =
      s"""CASE WHEN o.__in_old IS NULL THEN 'added'
         WHEN n.__in_new IS NULL THEN 'removed'
         WHEN $anyDiff THEN 'changed' ELSE 'unchanged' END"""
    val filterClause = if (includeUnchanged) "" else "WHERE status <> 'unchanged'"
    s"""WITH o AS (SELECT *, true AS __in_old FROM ($oldSql)),
n AS (SELECT *, true AS __in_new FROM ($newSql)),
d AS (SELECT $keys, $statusExpr AS status,
  CASE WHEN $statusExpr = 'changed'
    THEN list_filter([$diffs], x -> x IS NOT NULL)
    ELSE [] END AS diff_cols
FROM o FULL OUTER JOIN n ON $on)
SELECT $projectSql FROM d $filterClause ORDER BY ${keyCols.mkString(", ")}""".stripMargin
  }
}
