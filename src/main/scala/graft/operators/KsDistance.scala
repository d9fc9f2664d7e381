package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact two-sample Kolmogorov–Smirnov distance — the distribution-drift
  * number that catches what PSI's fixed buckets blur: KS is the maximum
  * gap between the two empirical CDFs, `sup_v |F_a(v) − F_b(v)|`,
  * sensitive to a shift ANYWHERE in the distribution (tail drift that
  * lands inside one PSI bucket is invisible to PSI and maximal to KS).
  * The pre/post-deploy latency comparison, the this-week/last-week score
  * drift, the treatment/control covariate check.
  *
  * Exactness: for integral values the supremum is attained at observed
  * values, and `|F_a − F_b|` cross-multiplies to the INTEGER
  * `|n_b·cumA(v) − n_a·cumB(v)|` over n_a·n_b — no float CDFs, no
  * binning; `ks_scaled = ⌊ks·10⁶⌋` via one non-negative floor division
  * with DECIMAL(38,0) magnitudes (n_a·n_b can pass 2⁶³), hashable on any
  * engine. `ks_num` itself is emitted as BIGINT — it is bounded by
  * n_a·n_b, so two multi-billion-row sides at high KS exceed the range
  * and throw LOUDLY under ANSI (never wrap); `ks_scaled` (the statistic)
  * is always safe — drop the ks_num column at that scale.
  *
  * Scale shape: both sides collapse to per-DISTINCT-value counts first
  * (partial-agg'd — a million duplicate measurements cost one row); the
  * cumulative walk and the totals are windows over the merged DISTINCT
  * values — value-cardinality-sized, not row-sized (the
  * [[WeightedStats.weightedMedian]] posture; the un-partitioned walk puts
  * that cardinality in one task, which is the statistic's sequential
  * nature — the `bucketWidth` parameter pre-buckets values in-plan when
  * a single series' distinct count exceeds task scale).
  * NULL values carry no mass and drop; an empty side yields an empty
  * result (no distribution to compare).
  */
object KsDistance {

  /** One row: (n_a, n_b, ks_num, ks_scaled) where ks = ks_num/(n_a·n_b)
    * and ks_scaled = ⌊ks·10⁶⌋.
    *
    * `bucketWidth` (default 1 = exact) pre-buckets values by floor
    * division BEFORE the distinct-value collapse — the wired form of the
    * scale note above: the un-partitioned cumulative walk is
    * value-cardinality-sized, so when a series' distinct count exceeds
    * task scale, a declared width coarsens the CDFs to range/width
    * buckets (the statistic becomes the KS of the BUCKETED
    * distributions — identical to running exact KS on pre-bucketed
    * values, which is what the equivalence spec pins). floorDiv on both
    * engines via the pmod identity (Spark `div` and DuckDB `//` both
    * truncate toward zero).
    */
  def ksDistance(a: DataFrame, b: DataFrame, valueCol: String,
                 bucketWidth: Long = 1L): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    graft.Guards.requireIntegral(a, valueCol, "ksDistance")
    graft.Guards.requireIntegral(b, valueCol, "ksDistance")
    def side(df: DataFrame, ca: Long, cb: Long) = {
      val v = col(valueCol).cast(LongType)
      val bucketed =
        if (bucketWidth == 1L) v
        else call_function("div", v - pmod(v, lit(bucketWidth)), lit(bucketWidth))
      df.where(col(valueCol).isNotNull)
        .select(bucketed.as("__v"), lit(ca).as("__a"), lit(cb).as("__b"))
    }
    val mass = side(a, 1L, 0L).unionByName(side(b, 0L, 1L))
      .groupBy(col("__v"))
      .agg(sum(col("__a")).as("__ca"), sum(col("__b")).as("__cb"))
    val walk = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy()
    mass
      .withColumn("__cuma", sum(col("__ca")).over(walk))
      .withColumn("__cumb", sum(col("__cb")).over(walk))
      .withColumn("__na", sum(col("__ca")).over(whole))
      .withColumn("__nb", sum(col("__cb")).over(whole))
      .withColumn("__dev",
        abs(col("__nb").cast("decimal(38,0)") * col("__cuma")
          - col("__na").cast("decimal(38,0)") * col("__cumb")))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(col("__dev")).as("__ks"))
      .where(col("n_a") > 0 && col("n_b") > 0)
      .select(col("n_a"), col("n_b"),
        col("__ks").cast(LongType).as("ks_num"),
        expr("CAST((__ks * 1000000) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("ks_scaled"))
  }

  /** Exact 1-D earth-mover (Wasserstein-1) distance — the INTEGRAL of
    * the CDF gap where [[ksDistance]] takes its MAXIMUM: KS says "the
    * distributions differ somewhere by this much", EMD says "this much
    * mass moved this far IN VALUE UNITS" — a $2 shift of every price is
    * tiny to KS on a wide distribution and exactly 2.0 units to EMD,
    * which is the number a cost model wants. For integer values the CDFs
    * are step functions, so W₁ = Σ_gaps \|F_a − F_b\|·gap is EXACT:
    * cross-multiplied emd_num = Σ \|n_b·cumA − n_a·cumB\|·(nextv − v)
    * over the merged distinct-value walk, published as a canonical
    * decimal string (it outgrows BIGINT: bounded by n_a·n_b·range) plus
    * ⌊10⁶·emd_num/(n_a·n_b)⌋ — the distance in micro value-units. Same
    * mass-collapse/value-walk posture and contracts as [[ksDistance]].
    */
  def emd(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    graft.Guards.requireIntegral(a, valueCol, "emd")
    graft.Guards.requireIntegral(b, valueCol, "emd")
    val dec = "decimal(38,0)"
    def side(df: DataFrame, ca: Long, cb: Long) = df
      .where(col(valueCol).isNotNull)
      .select(col(valueCol).cast(LongType).as("__v"),
        lit(ca).as("__a"), lit(cb).as("__b"))
    val mass = side(a, 1L, 0L).unionByName(side(b, 0L, 1L))
      .groupBy(col("__v"))
      .agg(sum(col("__a")).as("__ca"), sum(col("__b")).as("__cb"))
    val walk = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ord = Window.orderBy(col("__v"))
    val whole = Window.partitionBy()
    mass
      .withColumn("__cuma", sum(col("__ca")).over(walk))
      .withColumn("__cumb", sum(col("__cb")).over(walk))
      .withColumn("__na", sum(col("__ca")).over(whole))
      .withColumn("__nb", sum(col("__cb")).over(whole))
      .withColumn("__gap",
        coalesce(lead(col("__v"), 1).over(ord) - col("__v"), lit(0L)))
      .withColumn("__term",
        abs(col("__nb").cast(dec) * col("__cuma")
          - col("__na").cast(dec) * col("__cumb")) * col("__gap").cast(dec))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("__term")).as("__emd"))
      .where(col("n_a") > 0 && col("n_b") > 0)
      .select(col("n_a"), col("n_b"),
        col("__emd").cast("string").as("emd_num"),
        expr("CAST((__emd * 1000000) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("emd_q6"))
  }

  /** DuckDB replay of [[emd]]. */
  def emdOracle(aSql: String, bSql: String, valueSql: String): String =
    s"""WITH mass AS (
  SELECT v, sum(ca) AS ca, sum(cb) AS cb FROM (
    SELECT CAST($valueSql AS BIGINT) AS v, 1 AS ca, 0 AS cb FROM ($aSql)
      WHERE ($valueSql) IS NOT NULL
    UNION ALL
    SELECT CAST($valueSql AS BIGINT) AS v, 0 AS ca, 1 AS cb FROM ($bSql)
      WHERE ($valueSql) IS NOT NULL) GROUP BY v),
w AS (SELECT v,
    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
    sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
    coalesce(lead(v) OVER (ORDER BY v) - v, 0) AS gap
  FROM mass)
SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
  CAST(sum(abs(CAST(nb AS HUGEINT) * cuma - CAST(na AS HUGEINT) * cumb)
    * gap) AS VARCHAR) AS emd_num,
  CAST((sum(abs(CAST(nb AS HUGEINT) * cuma - CAST(na AS HUGEINT) * cumb)
    * gap) * 1000000)
    // (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT) AS emd_q6
FROM w HAVING max(na) > 0 AND max(nb) > 0""".stripMargin

  /** DuckDB replay of [[ksDistance]] — same mass collapse, same
    * cross-multiplied deviation walk; HUGEINT floor division on the
    * non-negative magnitudes.
    */
  def oracleSql(aSql: String, bSql: String, valueSql: String): String =
    s"""WITH mass AS (
  SELECT v, sum(ca) AS ca, sum(cb) AS cb FROM (
    SELECT CAST($valueSql AS BIGINT) AS v, 1 AS ca, 0 AS cb FROM ($aSql)
      WHERE ($valueSql) IS NOT NULL
    UNION ALL
    SELECT CAST($valueSql AS BIGINT) AS v, 0 AS ca, 1 AS cb FROM ($bSql)
      WHERE ($valueSql) IS NOT NULL) GROUP BY v),
w AS (SELECT v,
    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM mass)
SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
  CAST(max(abs(CAST(nb AS DECIMAL(38,0)) * cuma
    - CAST(na AS DECIMAL(38,0)) * cumb)) AS BIGINT) AS ks_num,
  CAST((CAST(max(abs(CAST(nb AS DECIMAL(38,0)) * cuma
      - CAST(na AS DECIMAL(38,0)) * cumb)) AS HUGEINT) * 1000000)
    // (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT) AS ks_scaled
FROM w HAVING max(na) > 0 AND max(nb) > 0""".stripMargin
}
