package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-row percentile-rank (ECDF) feature transform — "where does this
  * row sit within its group's value distribution", the rank-based
  * normalization feature pipelines reach for when magnitudes are
  * group-relative (spend percentile within a market, latency percentile
  * within a service): Hazen definition pct = (avgrank − ½)/n with
  * AVERAGE ranks for ties (the [[Spearman]] integer tie device), so two
  * equal values always share a percentile and the transform is
  * symmetric (pct + reverse-pct = 1 exactly on the doubled scale).
  * Published as `pct_q6 = ⌊10⁶·(r2 − 1)/(2n)⌋` over the doubled rank —
  * exact integers, one truncating division on non-negatives.
  *
  * Scale shape: NO per-group rank window — the [[RankDecomp]] two-level
  * decomposition builds a distinct-value rank MAP ((group, bucket)
  * windows), percentiles attach per distinct value, and rows LEFT-join
  * the map on the 8-byte (group, value) key, so a whale group never
  * sorts in one task and ties cost one map row, not n. NULL values keep
  * their row with NULL pct (a feature transform must not drop rows);
  * NULL groups are a real stratum.
  */
object PercentileRank {

  val Scale = 1000000L

  /** All input columns + `pct_q6`. `valueCol` must be integral. */
  def transform(df: DataFrame, groupCols: Seq[String], valueCol: String,
                bucketWidth: Long = 1000000L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    graft.Guards.requireIntegral(df, valueCol, "percentileRank")
    val g = groupCols.map(col)
    val base = df.where(col(valueCol).isNotNull)
    val mass = base
      .groupBy((g :+ col(valueCol).cast("long").as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val rmap = RankDecomp.doubledRankMap(mass, groupCols, "__v", "__c", bucketWidth)
    val totals = mass.groupBy(g: _*).agg(sum(col("__c")).as("__n"))
      .select((groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__tg$i") } :+
        col("__n")): _*)
    val tCond = groupCols.zipWithIndex.map { case (c, i) =>
      col(c) <=> col(s"__tg$i") }.reduce(_ && _)
    val perValue = rmap.join(totals, tCond)
      .select((groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__pg$i") } ++
        Seq(col("__v"),
          call_function("div", (col("__r2") - 1) * lit(Scale), lit(2) * col("__n"))
            .cast("long").as("pct_q6"))): _*)
    val jCond = groupCols.zipWithIndex.map { case (c, i) =>
      col(c) <=> col(s"__pg$i") }.reduce(_ && _) &&
      col(valueCol).cast("long") === col("__v")
    df.join(perValue, jCond, "left")
      .drop((Seq("__v") ++ groupCols.indices.map(i => s"__pg$i")): _*)
  }

  /** DuckDB replay: the window form over non-null values, left-joined
    * back so NULL-value rows surface with NULL pct — the decomposition
    * is gate-equal at every bucket width. `idE` must be unique per row.
    */
  def oracleSql(table: String, groupCols: Seq[String], idE: String,
                valueE: String, keepCols: Seq[String]): String = {
    val gl = groupCols.mkString(", ")
    s"""WITH nn AS (SELECT $gl, $idE AS id_, ($valueE) AS v FROM $table
  WHERE ($valueE) IS NOT NULL),
r AS (SELECT id_,
    CAST(((2 * rank() OVER (PARTITION BY $gl ORDER BY v)
      + count(*) OVER (PARTITION BY $gl, v) - 1) - 1) * $Scale
      // (2 * count(*) OVER (PARTITION BY $gl)) AS BIGINT) AS pct_q6
  FROM nn)
SELECT ${keepCols.map(c => s"t.$c").mkString(", ")}, r.pct_q6
FROM $table t LEFT JOIN r ON t.$idE = r.id_
ORDER BY t.$idE"""
  }
}
