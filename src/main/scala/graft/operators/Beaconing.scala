package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Beaconing screen — malware C2 callbacks, stuck retry loops, and
  * runaway cron jobs all share one signature: a channel that fires at
  * SUSPICIOUSLY REGULAR intervals, which is exactly the opposite tail
  * of [[Dispersion]]'s overdispersion alarm — here LOW dispersion of
  * the inter-arrival gaps is the signal (humans are bursty; timers are
  * metronomes). The classical first-pass network-hunting heuristic,
  * run per (entity, channel).
  *
  * Exact semantics: per key the ts-ordered gaps come from one lag
  * window (ties legitimately produce zero gaps); their dispersion
  * publishes as the exact Fano fraction var_num = nΣg²−(Σg)², den =
  * (n−1)Σg (canonical DECIMAL strings + the declared truncating
  * fano_q6 — the L343 machinery on gaps instead of counts), and the
  * VERDICT is cross-multiplied exact: is_beacon ⇔ n_gaps ≥ minGaps ∧
  * Σg > 0 ∧ var_num·10⁶ < maxFanoQ6·den (never a float compare at the
  * threshold). A perfectly-regular timer (all gaps equal) scores
  * var_num = 0 — beacon at any threshold; keys with < minGaps gaps
  * publish NULL verdict (insufficient evidence, not innocence).
  *
  * Scale shape: one per-key lag window over the event order + one
  * partial-agg'd three-sum collapse — the [[RunsTest]] posture; no
  * joins.
  */
object Beaconing {

  val Scale = 1000000L

  /** (keyCols*, n_gaps, sum_gap, var_num, den, fano_q6, is_beacon). */
  def screen(events: DataFrame, keyCols: Seq[String], tsCol: String,
             minGaps: Long = 5L, maxFanoQ6: Long = 100000L): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(minGaps >= 2, s"minGaps must be >= 2, got $minGaps")
    require(maxFanoQ6 > 0, s"maxFanoQ6 must be positive, got $maxFanoQ6")
    val dec = "decimal(38,0)"
    val t = unix_micros(col(tsCol).cast("timestamp"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(t)
    val gaps = events
      .where(col(tsCol).isNotNull)
      .withColumn("__g", t - lag(t, 1).over(w))
      .where(col("__g").isNotNull)
    val agg = gaps.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_gaps"), sum(col("__g")).as("sum_gap"),
        sum(col("__g").cast(dec) * col("__g").cast(dec)).cast(dec).as("__ss"))
    val n = col("n_gaps").cast(dec)
    val varNum = n * col("__ss") -
      col("sum_gap").cast(dec) * col("sum_gap").cast(dec)
    val den = (n - lit(1).cast(dec)) * col("sum_gap").cast(dec)
    val enough = col("n_gaps") >= minGaps
    val defined = col("n_gaps") >= 2L && col("sum_gap") > 0L
    agg.select((keyCols.map(col) ++ Seq(
      col("n_gaps"), col("sum_gap"),
      varNum.cast("string").as("var_num"),
      den.cast("string").as("den"),
      when(defined,
        call_function("div", varNum * lit(Scale).cast(dec), den.cast(dec)))
        .as("fano_q6"),
      when(enough && defined,
        varNum * lit(Scale).cast(dec) < lit(maxFanoQ6).cast(dec) * den)
        .as("is_beacon"))): _*)
  }

  /** DuckDB replay; `eventsSql` yields key cols + t_us. */
  def oracleSql(eventsSql: String, keyCols: Seq[String], minGaps: Long,
                maxFanoQ6: Long): String = {
    val g = keyCols.mkString(", ")
    s"""WITH gaps AS (
  SELECT $g, t_us - lag(t_us) OVER (PARTITION BY $g ORDER BY t_us) AS gp
  FROM ($eventsSql) WHERE t_us IS NOT NULL),
a AS (SELECT $g, CAST(count(*) AS HUGEINT) AS n, CAST(sum(gp) AS HUGEINT) AS s,
    sum(CAST(gp AS HUGEINT) * CAST(gp AS HUGEINT)) AS ss
  FROM gaps WHERE gp IS NOT NULL GROUP BY $g)
SELECT $g, CAST(n AS BIGINT) AS n_gaps, CAST(s AS BIGINT) AS sum_gap,
  CAST(n * ss - s * s AS VARCHAR) AS var_num,
  CAST((n - 1) * s AS VARCHAR) AS den,
  CASE WHEN n >= 2 AND s > 0
       THEN CAST((n * ss - s * s) * $Scale // ((n - 1) * s) AS BIGINT)
  END AS fano_q6,
  CASE WHEN n >= $minGaps AND n >= 2 AND s > 0
       THEN (n * ss - s * s) * $Scale < $maxFanoQ6 * ((n - 1) * s)
  END AS is_beacon
FROM a ORDER BY $g"""
  }
}
