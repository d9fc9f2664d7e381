package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lead-lag cross-correlation between TWO integer series on one index
  * grid — which one moves first? The screen behind "does spend lead
  * orders", "do errors lead churn", "is this metric just a delayed
  * copy of that one": corr(x at t−lag, y at t) for every lag in
  * [−maxLag, maxLag]. A positive-lag peak means x LEADS y by that many
  * steps; negative means y leads; the lag-0 column is plain
  * contemporaneous correlation ([[Autocorr]] is the x = y diagonal of
  * this at a single positive lag).
  *
  * Pairs match EXACTLY on the integer index — gaps contribute no pair
  * (missing days don't fabricate adjacency; densify first when
  * calendar adjacency is wanted), and the pair count n honestly
  * shrinks at the grid edges as |lag| grows. The x side is replicated
  * once per lag (2·maxLag+1 rows per observation) and joined ONCE on
  * (group, shifted index); per-(group, lag) moments are the shared
  * five exact DECIMAL(38,0) partials of [[GroupedTrend.correlation]].
  *
  * Scale shape: one lag-replicated equi-join on 8-byte (group, index)
  * keys, then the decomposable-aggregate posture — a whale group is
  * map-side accumulation only; the replication factor is the declared
  * 2·maxLag+1, never data-dependent.
  *
  * Contracts: (group, idx) should identify one observation (duplicates
  * cross-pair identically on both engines, but the statistic stops
  * being a cross-correlation); rows with NULL idx, x or y drop — the
  * operator correlates the JOINT series, so a one-sided observation
  * has no pair partner at lag 0 either; NULL groups are a real stratum
  * (null-safe join); corr is NULL where an axis is constant.
  */
object CrossCorr {

  /** (group, lag, n, corr_num, var_x, var_y, corr) for every lag in
    * [−maxLag, maxLag]; x is the hypothesized leader.
    */
  def leadLag(df: DataFrame, groupCol: String, idxCol: String,
              xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60,
      s"maxLag must be in [1, 60], got $maxLag")
    Seq(idxCol, xCol, yCol).foreach(c =>
      graft.Guards.requireIntegral(df, c, "leadLag"))
    val base = df
      .where(col(idxCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(groupCol), col(idxCol).cast("long").as("__t"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .localCheckpoint(true)
    val lagLits = (-maxLag to maxLag).map(l => lit(l.toLong))
    val xs = base
      .select(col(groupCol).as("__g2"), col("__t"), col("__x").as("__xl"))
      .withColumn("lag", explode(array(lagLits: _*)))
      .select(col("__g2"), col("lag"), (col("__t") + col("lag")).as("__t2"),
        col("__xl"))
    val pairs = base.join(xs,
        col(groupCol) <=> col("__g2") && col("__t") === col("__t2"))
      .select(col(groupCol), col("lag"), col("__xl"), col("__y"))
    GroupedTrend.correlation(pairs, Seq(groupCol, "lag"), "__xl", "__y")
  }

  /** Rolling windowed correlation — the relationship's TRAJECTORY:
    * [[leadLag]] asks which series leads over the whole history; this
    * asks whether the coupling itself is drifting ("spend and orders
    * correlated at 0.9 until March, 0.2 since" — the co-movement
    * breakdown alarm). Per (group, idx): the five exact DECIMAL(38,0)
    * Pearson moments over the trailing `window` index units (a RANGE
    * frame on the integer index — gap-robust: missing days shrink n,
    * they don't stretch the window), published as the L176 canonical
    * decimal strings (corr_num, var_x, var_y; r is one caller-side
    * double) with NULL components below `minN` rows (a 2-point
    * correlation is noise, not signal — the honest warm-up edge).
    *
    * Scale shape: the sessionized posture — hash by group, one
    * spill-backed sort, SIX running RANGE aggregates in one window
    * pass; feed the [[DenseSeries]] spine so groups stay
    * calendar-sized.
    */
  def rolling(df: DataFrame, groupCol: String, idxCol: String,
              xCol: String, yCol: String, window: Long,
              minN: Long = 3L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minN >= 2, s"minN must be >= 2, got $minN")
    graft.Guards.requireIntegral(df, idxCol, "rolling")
    graft.Guards.requireIntegral(df, xCol, "rolling")
    graft.Guards.requireIntegral(df, yCol, "rolling")
    val dec = "decimal(38,0)"
    val rows = df
      .where(col(idxCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(groupCol), col(idxCol).cast("long").as("idx"),
        col(xCol).cast("long").cast(dec).as("__x"),
        col(yCol).cast("long").cast(dec).as("__y"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("idx").asc)
      .rangeBetween(-(window - 1), 0)
    val staged = rows
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(col("__x")).over(w))
      .withColumn("__sy", sum(col("__y")).over(w))
      .withColumn("__sxy", sum(col("__x") * col("__y")).over(w))
      .withColumn("__sxx", sum(col("__x") * col("__x")).over(w))
      .withColumn("__syy", sum(col("__y") * col("__y")).over(w))
    val nD = col("__n").cast(dec)
    def comp(sab: String, sa: String, sb: String) =
      when(col("__n") >= minN,
        (nD * col(sab) - col(sa) * col(sb)).cast("string"))
    staged.select(col(groupCol), col("idx"), col("__n").as("n_w"),
      comp("__sxy", "__sx", "__sy").as("corr_num"),
      comp("__sxx", "__sx", "__sx").as("var_x"),
      comp("__syy", "__sy", "__sy").as("var_y"))
  }

  /** DuckDB replay of [[rolling]] — the same RANGE frame over HUGEINT
    * moments; `seriesSql` must yield (grp, i, x, y).
    */
  def rollingOracle(seriesSql: String, groupName: String, window: Long,
                    minN: Long = 3L): String =
    s"""WITH r AS (
  SELECT grp AS $groupName, CAST(i AS BIGINT) AS idx,
    CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
  FROM ($seriesSql)
  WHERE i IS NOT NULL AND x IS NOT NULL AND y IS NOT NULL),
m AS (
  SELECT $groupName, idx,
    count(*) OVER win AS n, sum(x) OVER win AS sx, sum(y) OVER win AS sy,
    sum(x * y) OVER win AS sxy, sum(x * x) OVER win AS sxx,
    sum(y * y) OVER win AS syy
  FROM r
  WINDOW win AS (PARTITION BY $groupName ORDER BY idx ASC
    RANGE BETWEEN ${window - 1} PRECEDING AND CURRENT ROW))
SELECT $groupName, idx, CAST(n AS BIGINT) AS n_w,
  CASE WHEN n >= $minN THEN CAST(n * sxy - sx * sy AS VARCHAR) END
    AS corr_num,
  CASE WHEN n >= $minN THEN CAST(n * sxx - sx * sx AS VARCHAR) END
    AS var_x,
  CASE WHEN n >= $minN THEN CAST(n * syy - sy * sy AS VARCHAR) END
    AS var_y
FROM m ORDER BY $groupName, idx"""

  /** DuckDB replay of [[leadLag]] — the same lag-replicated pair join,
    * finished by the shared Pearson moment oracle.
    */
  def oracleSql(table: String, groupCol: String, idxSql: String,
                xSql: String, ySql: String, maxLag: Int): String = {
    val series = s"SELECT $groupCol, CAST($idxSql AS BIGINT) AS t, " +
      s"CAST($xSql AS BIGINT) AS x, CAST($ySql AS BIGINT) AS y FROM $table " +
      s"WHERE ($idxSql) IS NOT NULL AND ($xSql) IS NOT NULL " +
      s"AND ($ySql) IS NOT NULL"
    val pairSql =
      s"""SELECT a.$groupCol, l.lag, b.x, a.y
FROM ($series) a
JOIN (SELECT CAST(unnest(generate_series(-$maxLag, $maxLag)) AS BIGINT)
        AS lag) l ON true
JOIN ($series) b
  ON a.$groupCol IS NOT DISTINCT FROM b.$groupCol AND b.t + l.lag = a.t"""
    GroupedTrend.correlationOracle(s"($pairSql) cc", Seq(groupCol, "lag"),
      "x", "y")
  }
}
