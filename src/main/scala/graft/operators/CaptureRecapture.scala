package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chapman capture–recapture — estimate the size of a population you
  * can only SAMPLE from the overlap of two independent captures: crawl
  * coverage ("two crawls saw 40M and 35M pages, 28M in both — how big is
  * the web corpus we're missing?"), dedup-universe sizing, wildlife-style
  * user-base estimates across two telemetry channels. The Chapman
  * estimator N̂ = (n₁+1)(n₂+1)/(m+1) − 1 is the bias-corrected
  * Lincoln–Petersen form that stays defined at zero overlap.
  *
  * Exact semantics: n₁, n₂, m are exact distinct-key counts; `nhat` and
  * the Chapman variance `(n₁+1)(n₂+1)(n₁−m)(n₂−m)/((m+1)²(m+2))` are
  * each ONE truncating division on non-negative DECIMAL(38,0) operands
  * (declared floors). The estimator's independence assumption is the
  * CALLER's claim — the operator publishes the three counts so a reader
  * can judge it.
  *
  * Scale shape: both sides collapse to distinct (group, key) sets
  * (partial-agg'd), the overlap is one flag-union aggregate keyed by the
  * join key — one shuffle of key-width rows, output groups-sized.
  */
object CaptureRecapture {

  /** Per group: (groupCols…, n1, n2, overlap, nhat, var_floor). Ungrouped
    * when `groupCols` is empty (one row).
    */
  def chapman(a: DataFrame, b: DataFrame, keyCol: String,
              groupCols: Seq[String] = Nil): DataFrame = {
    val dec = "decimal(38,0)"
    def side(df: DataFrame, flag: String) = df
      .where(col(keyCol).isNotNull)
      .select((groupCols.map(col) :+ col(keyCol).as("__k")
        :+ lit(1L).as(flag)): _*)
      .withColumn(if (flag == "__a") "__b" else "__a", lit(0L))
      .select((groupCols.map(col) :+ col("__k") :+ col("__a") :+ col("__b")): _*)
    val tagged = side(a, "__a").union(side(b, "__b"))
      .groupBy((groupCols.map(col) :+ col("__k")): _*)
      .agg(max(col("__a")).as("__ina"), max(col("__b")).as("__inb"))
    val counts = tagged
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__ina")).as("n1"), sum(col("__inb")).as("n2"),
        sum(col("__ina") * col("__inb")).as("overlap"))
    val n1 = col("n1").cast(dec); val n2 = col("n2").cast(dec)
    val m = col("overlap").cast(dec)
    val one = lit(1).cast(dec)
    val nhat = call_function("div",
      ((n1 + one) * (n2 + one)).cast(dec), (m + one).cast(dec)) - one
    val varNum = ((n1 + one) * (n2 + one) * (n1 - m) * (n2 - m)).cast(dec)
    val varDen = ((m + one) * (m + one) * (m + lit(2).cast(dec))).cast(dec)
    counts.select((groupCols.map(col) :+ col("n1") :+ col("n2")
      :+ col("overlap")
      :+ nhat.cast("long").as("nhat")
      :+ call_function("div", varNum, varDen).cast("long").as("var_floor")): _*)
  }

  /** DuckDB replay — `aSql`/`bSql` yield (grp…, k); same flag-union
    * aggregate, HUGEINT products, floor divisions.
    */
  def oracleSql(aSql: String, bSql: String, groupExprs: Seq[String]): String = {
    val g = if (groupExprs.isEmpty) "" else groupExprs.mkString(", ") + ", "
    val gBare = if (groupExprs.isEmpty) "" else groupExprs.mkString(", ")
    val groupBy = if (groupExprs.isEmpty) "" else s"GROUP BY $gBare"
    val orderBy = if (groupExprs.isEmpty) "" else s"ORDER BY $gBare"
    val gSel = if (groupExprs.isEmpty) "" else gBare + ","
    s"""WITH u AS (
  SELECT ${g}k, 1 AS ina, 0 AS inb FROM ($aSql) WHERE k IS NOT NULL
  UNION ALL
  SELECT ${g}k, 0 AS ina, 1 AS inb FROM ($bSql) WHERE k IS NOT NULL),
t AS (SELECT ${g}k, max(ina) AS ina, max(inb) AS inb
  FROM u GROUP BY ${g}k),
c AS (SELECT $gSel CAST(sum(ina) AS HUGEINT) AS n1,
    CAST(sum(inb) AS HUGEINT) AS n2,
    CAST(sum(ina * inb) AS HUGEINT) AS m
  FROM t $groupBy)
SELECT $gSel CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  CAST(m AS BIGINT) AS overlap,
  CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS nhat,
  CAST((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
    // ((m + 1) * (m + 1) * (m + 2)) AS BIGINT) AS var_floor
FROM c $orderBy"""
  }
}
