package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** A/B experiment comparison — per-arm moments and Welch's t against a
  * control arm, the readout step after [[graft.text.CorpusFilters]]-style
  * treatment splits (`trainValTestSplit` assigns arms; this scores them).
  *
  * The exact-integer discipline of [[GroupedTrend]]: per-arm n, Σx, Σx²
  * accumulate in DECIMAL(38,0) (order-independent, engine-replayable),
  * the variance numerator n·Σx² − (Σx)² is the shared cross-moment, and
  * the mean difference is emitted as an EXACT milli-quantized integer
  * (⌊1000·(Σx_t·n_c − Σx_c·n_t)/(n_t·n_c)⌋ — cross-multiplied, no
  * intermediate float). Welch's t rides along as the one double chain
  * (two divisions + an IEEE sqrt — deterministic given exact inputs);
  * the gate checks the integers, the spec checks t.
  *
  * Scale shape: ONE shuffle (the arm groupBy, three decimal partials per
  * (arm, partition) — whale arms are map-side accumulation), then the
  * control row broadcasts onto the arms-sized frame. `valueCol` must be
  * integral (the Drift rule — scale to cents/millis upstream).
  */
object AbTest {

  /** Per-arm exact moments: (arm, n, sum_v, sumsq_v, var_num) where
    * var_num = n·Σx² − (Σx)² (sample variance = var_num / (n·(n−1))).
    * NULL arms and NULL values are excluded.
    */
  def armStats(df: DataFrame, armCol: String, valueCol: String): DataFrame = {
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"armStats needs an integral value column (scale to integer units " +
          s"first); $valueCol is ${other.catalogString}")
    }
    val dec = "decimal(38,0)"
    val x = col(valueCol).cast(LongType).cast(dec)
    df.where(col(armCol).isNotNull && col(valueCol).isNotNull)
      .select(col(armCol).as("arm"), x.as("__x"),
        (x * x).cast(dec).as("__xx"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n"),
        sum("__x").as("sum_v"), sum("__xx").as("sumsq_v"))
      .withColumn("var_num",
        (col("n").cast(dec) * col("sumsq_v") - col("sum_v") * col("sum_v")).cast(dec))
  }

  /** Every treatment arm vs `controlArm`: exact integer mean difference in
    * milli-units plus Welch's t (NULL when either arm has n < 2 or zero
    * variance denominators degenerate).
    */
  def compareToControl(df: DataFrame, armCol: String, valueCol: String,
                       controlArm: String): DataFrame = {
    val stats = armStats(df, armCol, valueCol)
    val control = broadcast(stats.where(col("arm") === controlArm)
      .select(col("n").as("n_c"), col("sum_v").as("sum_c"),
        col("var_num").as("var_num_c")))
    val dec = "decimal(38,0)"
    val diffNum = (col("sum_v") * col("n_c").cast(dec) -
      col("sum_c") * col("n").cast(dec)).cast(dec)
    val diffDen = (col("n").cast(dec) * col("n_c").cast(dec)).cast(dec)
    // sample variances as doubles for the t denominator — one chain
    val varT = col("var_num").cast("double") /
      (col("n").cast("double") * (col("n") - 1).cast("double"))
    val varC = col("var_num_c").cast("double") /
      (col("n_c").cast("double") * (col("n_c") - 1).cast("double"))
    val se = sqrt(varT / col("n").cast("double") + varC / col("n_c").cast("double"))
    stats.where(col("arm") =!= controlArm)
      .crossJoin(control)
      .withColumn("__dn", diffNum)
      .withColumn("__dd", diffDen)
      .select(
        col("arm"), col("n").as("n_arm"), col("n_c"),
        (signum(col("__dn")).cast("long") *
          expr("CAST((abs(__dn) * 1000) div __dd AS BIGINT)"))
          .as("mean_diff_milli"),
        when(col("n") >= 2 && col("n_c") >= 2 && se > 0.0,
          (col("__dn").cast("double") / col("__dd").cast("double")) / se)
          .as("welch_t"))
  }

  /** Heterogeneous treatment effects: [[compareToControl]] within every
    * `segmentCol` value independently — "the lift is +2% overall but
    * −5% on mobile". Same exact arithmetic; the control join is keyed by
    * segment (broadcastable — the frame is segments×arms-sized), so
    * nothing beyond the one (segment, arm) groupBy shuffles. Segments
    * whose control arm is absent drop out (no baseline to compare).
    */
  def compareToControlBySegment(df: DataFrame, segmentCol: String,
                                armCol: String, valueCol: String,
                                controlArm: String): DataFrame = {
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"compareToControlBySegment needs an integral value column; " +
          s"$valueCol is ${other.catalogString}")
    }
    val dec = "decimal(38,0)"
    val x = col(valueCol).cast(LongType).cast(dec)
    val stats = df
      .where(col(segmentCol).isNotNull && col(armCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(segmentCol).as("segment"), col(armCol).as("arm"),
        x.as("__x"), (x * x).cast(dec).as("__xx"))
      .groupBy("segment", "arm")
      .agg(count(lit(1)).as("n"),
        sum("__x").as("sum_v"), sum("__xx").as("sumsq_v"))
      .withColumn("var_num",
        (col("n").cast(dec) * col("sumsq_v") - col("sum_v") * col("sum_v")).cast(dec))
    val control = stats.where(col("arm") === controlArm)
      .select(col("segment"), col("n").as("n_c"), col("sum_v").as("sum_c"),
        col("var_num").as("var_num_c"))
    val diffNum = (col("sum_v") * col("n_c").cast(dec) -
      col("sum_c") * col("n").cast(dec)).cast(dec)
    val diffDen = (col("n").cast(dec) * col("n_c").cast(dec)).cast(dec)
    val varT = col("var_num").cast("double") /
      (col("n").cast("double") * (col("n") - 1).cast("double"))
    val varC = col("var_num_c").cast("double") /
      (col("n_c").cast("double") * (col("n_c") - 1).cast("double"))
    val se = sqrt(varT / col("n").cast("double") + varC / col("n_c").cast("double"))
    stats.where(col("arm") =!= controlArm)
      .join(broadcast(control), Seq("segment"))
      .withColumn("__dn", diffNum)
      .withColumn("__dd", diffDen)
      .select(
        col("segment"), col("arm"), col("n").as("n_arm"), col("n_c"),
        (signum(col("__dn")).cast("long") *
          expr("CAST((abs(__dn) * 1000) div __dd AS BIGINT)"))
          .as("mean_diff_milli"),
        when(col("n") >= 2 && col("n_c") >= 2 && se > 0.0,
          (col("__dn").cast("double") / col("__dd").cast("double")) / se)
          .as("welch_t"))
  }

  /** Sample-ratio-mismatch check — the validity gate run BEFORE reading
    * any effect: do the observed arm counts match the intended split?
    * (A biased assignment silently invalidates every downstream
    * comparison; SRM is the standard tripwire.) Per-arm chi-square
    * contribution (nᵢ − eᵢ)²/eᵢ with eᵢ = N·wᵢ/W, computed as the exact
    * cross-multiplied integer ⌊10⁶·(nᵢ·W − N·wᵢ)² / (N·wᵢ·W)⌋ — no
    * float expected counts, so the statistic hashes cross-engine
    * (compare Σ against the χ²(arms−1) critical value downstream).
    * Arms observed but not in `weights` get NULL contributions (an
    * unexpected arm IS the mismatch — surface it, don't fold it in);
    * weighted arms with zero observations still appear with their full
    * deficit. One partial-agg'd count + an arms-sized join.
    */
  def sampleRatioCheck(df: DataFrame, armCol: String,
                       weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val w = weights.values.sum
    val observed = df.where(col(armCol).isNotNull)
      .groupBy(col(armCol).as("arm")).agg(count(lit(1)).as("n_obs"))
    val expected = weights.toSeq.sortBy(_._1).toDF("arm", "weight")
    val joined = observed.join(expected, Seq("arm"), "full_outer")
      .select(col("arm"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("weight"))
    val total = broadcast(joined.agg(
      coalesce(sum("n_obs"), lit(0L)).as("__N")))
    val dn = (col("n_obs").cast(dec) * lit(w).cast(dec) -
      col("__N").cast(dec) * col("weight").cast(dec)).cast(dec)
    val den = (col("__N").cast(dec) * col("weight").cast(dec) * lit(w).cast(dec)).cast(dec)
    joined.crossJoin(total)
      .withColumn("__dn", dn)
      .withColumn("__dd", den)
      .select(col("arm"), col("n_obs"), col("weight"),
        when(col("weight").isNotNull && col("__dd") > lit(0).cast(dec),
          expr("CAST((__dn * __dn * 1000000) div __dd AS BIGINT)"))
          .as("chisq_q"))
  }

  /** DuckDB replay of [[sampleRatioCheck]]. */
  def srmOracleSql(table: String, armSql: String,
                   weights: Map[String, Long]): String = {
    val w = weights.values.sum
    val ws = weights.toSeq.sortBy(_._1)
    val values = ws.map { case (a, wt) =>
      s"('${a.replace("'", "''")}', CAST($wt AS BIGINT))"
    }.mkString(", ")
    s"""WITH obs AS (SELECT $armSql AS arm, CAST(count(*) AS BIGINT) AS n_obs
       |  FROM $table WHERE ($armSql) IS NOT NULL GROUP BY 1),
       |exp AS (SELECT * FROM (VALUES $values) v(arm, weight)),
       |j AS (SELECT coalesce(obs.arm, exp.arm) AS arm,
       |    coalesce(obs.n_obs, 0) AS n_obs, exp.weight
       |  FROM obs FULL OUTER JOIN exp ON obs.arm = exp.arm),
       |t AS (SELECT CAST(coalesce(sum(n_obs), 0) AS HUGEINT) AS N FROM j)
       |SELECT j.arm, j.n_obs, j.weight,
       |  CASE WHEN j.weight IS NOT NULL AND t.N * j.weight * $w > 0 THEN
       |    CAST(((CAST(j.n_obs AS HUGEINT) * $w - t.N * j.weight)
       |      * (CAST(j.n_obs AS HUGEINT) * $w - t.N * j.weight) * 1000000)
       |      // (t.N * j.weight * $w) AS BIGINT)
       |  END AS chisq_q
       |FROM j CROSS JOIN t
       |ORDER BY j.arm""".stripMargin
  }

  /** DuckDB replay of [[compareToControlBySegment]]'s integer surface. */
  def segmentedOracleSql(table: String, segmentSql: String, armSql: String,
                         valueSql: String, controlArm: String): String =
    s"""WITH s AS (SELECT $segmentSql AS segment, $armSql AS arm,
       |    CAST(count(*) AS BIGINT) AS n, sum(CAST($valueSql AS HUGEINT)) AS sum_v
       |  FROM $table WHERE ($segmentSql) IS NOT NULL AND ($armSql) IS NOT NULL
       |    AND ($valueSql) IS NOT NULL
       |  GROUP BY 1, 2),
       |c AS (SELECT segment, n AS n_c, sum_v AS sum_c FROM s WHERE arm = '$controlArm')
       |SELECT s.segment, s.arm, s.n AS n_arm, c.n_c,
       |  CAST(CASE WHEN s.sum_v * c.n_c - c.sum_c * s.n < 0 THEN -1 ELSE 1 END
       |    * ((abs((s.sum_v * c.n_c - c.sum_c * s.n) * 1000)) // (s.n * c.n_c))
       |    AS BIGINT) AS mean_diff_milli
       |FROM s JOIN c USING (segment) WHERE s.arm <> '$controlArm'
       |ORDER BY s.segment, s.arm""".stripMargin

  /** DuckDB replay of [[compareToControl]]'s integer surface (t is
    * spec-checked, not gated — the gate drops it).
    */
  def oracleSql(table: String, armSql: String, valueSql: String,
                controlArm: String): String =
    s"""WITH s AS (SELECT $armSql AS arm, CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST($valueSql AS HUGEINT)) AS sum_v
       |  FROM $table WHERE ($armSql) IS NOT NULL AND ($valueSql) IS NOT NULL
       |  GROUP BY 1),
       |c AS (SELECT n AS n_c, sum_v AS sum_c FROM s WHERE arm = '$controlArm')
       |SELECT s.arm, s.n AS n_arm, c.n_c,
       |  CAST(CASE WHEN s.sum_v * c.n_c - c.sum_c * s.n < 0 THEN -1 ELSE 1 END
       |    * ((abs((s.sum_v * c.n_c - c.sum_c * s.n) * 1000)) // (s.n * c.n_c))
       |    AS BIGINT) AS mean_diff_milli
       |FROM s CROSS JOIN c WHERE s.arm <> '$controlArm'
       |ORDER BY s.arm""".stripMargin
}
