package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFM scoring — the classic customer-value segmentation (recency /
  * frequency / monetary, each quintiled, concatenated to a 3-digit
  * segment code): per entity, days since last activity, activity count,
  * and monetary total, each ranked into `k` exact NTILE buckets so
  * "555 = recent, frequent, big spender" reads the same on any engine.
  * The behavioral-analytics staple that composes three primitives this
  * library already owns — one partial-agg'd per-entity aggregate, a
  * 1-row global-max broadcast, and [[QuantileBuckets.ntileExact]]'s
  * global-sort-free bucketing (range exchange + dense index, never a
  * single-partition window) run once per dimension.
  *
  * Conventions: scores are 1..k with k best — recency inverts its bucket
  * (fewest days since last activity = highest score); frequency and
  * monetary score their bucket directly. Ties order by the entity id
  * (ntileExact's determinism rule), so the whole frame is replayable.
  */
object Rfm {

  /** (entity, r_days, f_n, m_cents, r_score, f_score, m_score, rfm) with
    * rfm = r·100 + f·10 + m. `dateCol` is a date column; `centsCol` must
    * be an integral monetary expression (scale upstream).
    */
  def rfmScores(df: DataFrame, entityCol: String, dateCol: String,
                cents: org.apache.spark.sql.Column, k: Int = 5): DataFrame = {
    require(k >= 2 && k <= 10,
      s"k must be in 2..10 (the decimal segment code r*100+f*10+m collides beyond), got $k")
    val base = df
      .where(col(entityCol).isNotNull && col(dateCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(max(col(dateCol)).as("__last"),
        count(lit(1)).as("f_n"),
        sum(cents).as("m_cents"))
    val maxd = base.agg(max(col("__last")).as("__maxd"))
    // each ntileExact consumes its input TWICE (range-sorted dense-index
    // path + the row-count aggregate), and the three calls nest — without
    // checkpoints the entity aggregate's lineage re-executes ~2^3 times;
    // the frames are entity-count-sized, so eager checkpoints are cheap
    val withR = base.crossJoin(broadcast(maxd))
      .withColumn("r_days", datediff(col("__maxd"), col("__last")).cast("long"))
      .drop("__last", "__maxd")
      .localCheckpoint(true)
    val rb = QuantileBuckets.ntileExact(withR, "r_days", entityCol, k)
      .withColumnRenamed("bucket", "__rb").localCheckpoint(true)
    val fb = QuantileBuckets.ntileExact(rb, "f_n", entityCol, k)
      .withColumnRenamed("bucket", "__fb").localCheckpoint(true)
    val mb = QuantileBuckets.ntileExact(fb, "m_cents", entityCol, k)
      .withColumnRenamed("bucket", "__mb")
    mb.select(col(entityCol), col("r_days"), col("f_n"), col("m_cents"),
        (lit(k + 1) - col("__rb")).as("r_score"),
        col("__fb").as("f_score"), col("__mb").as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** DuckDB replay — window NTILE over the same (value, entity) total
    * order (provably equivalent to ntileExact's integer size rule).
    */
  def rfmOracle(table: String, entityCol: String, dateCol: String,
                centsSql: String, k: Int = 5): String =
    s"""WITH base AS (SELECT $entityCol, max(CAST($dateCol AS DATE)) AS last_d,
    CAST(count(*) AS BIGINT) AS f_n, CAST(sum($centsSql) AS BIGINT) AS m_cents
  FROM $table WHERE $entityCol IS NOT NULL AND $dateCol IS NOT NULL
  GROUP BY 1),
r AS (SELECT *, CAST(date_diff('day', last_d, (SELECT max(last_d) FROM base)) AS BIGINT) AS r_days
  FROM base),
s AS (SELECT *,
    ntile($k) OVER (ORDER BY r_days NULLS FIRST, $entityCol) AS rb,
    ntile($k) OVER (ORDER BY f_n NULLS FIRST, $entityCol) AS fb,
    ntile($k) OVER (ORDER BY m_cents NULLS FIRST, $entityCol) AS mb
  FROM r)
SELECT $entityCol, r_days, f_n, m_cents,
  CAST(${k + 1} - rb AS BIGINT) AS r_score, CAST(fb AS BIGINT) AS f_score,
  CAST(mb AS BIGINT) AS m_score,
  CAST((${k + 1} - rb) * 100 + fb * 10 + mb AS BIGINT) AS rfm
FROM s ORDER BY $entityCol""".stripMargin
}
