package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal train/test split with an embargo gap — the time-series
  * counterpart of [[graft.llm.LeakageSplit]]'s content-keyed split: when
  * rows are autocorrelated in time (user behavior, market data, sensor
  * streams), a random split leaks the near future into training; the
  * honest protocol is train strictly BEFORE a boundary, test strictly
  * AFTER boundary + embargo, and the embargo band between them used by
  * NEITHER side (it absorbs the autocorrelation horizon — the purged
  * split of the financial-ML literature).
  *
  * Split rule on integer time: train `t < boundary`, embargo
  * `boundary <= t < boundary + embargoLen`, test `t >= boundary +
  * embargoLen` — pure threshold comparisons, engine-independent, no
  * hashing. The [[entityLeakage]] twin reports the entities (users,
  * series keys) present on BOTH sides of the cut — entity memorization
  * is the leak an embargo cannot absorb, and a reviewer decides whether
  * to group-split those.
  *
  * Scale shape: the split column is one scan-stage CASE (zero shuffle);
  * the leakage audit is two partial-agg'd distinct sides + an inner
  * join on the 8-byte entity key, output entities-sized.
  */
object TemporalSplit {

  /** Input plus a `split` column ('train' / 'embargo' / 'test'). */
  def assign(df: DataFrame, idxCol: String, boundary: Long,
             embargoLen: Long): DataFrame = {
    graft.Guards.requireIntegral(df, idxCol, "temporalSplit")
    require(embargoLen >= 0, s"embargoLen must be >= 0, got $embargoLen")
    df.withColumn("split",
      when(col(idxCol).isNull, lit(null).cast("string"))
        .when(col(idxCol) < boundary, lit("train"))
        .when(col(idxCol) < boundary + embargoLen, lit("embargo"))
        .otherwise(lit("test")))
  }

  /** Per-split row counts + entity counts: (split, n_rows, n_entities) —
    * the size readout a split review starts from.
    */
  def summary(df: DataFrame, idxCol: String, entityCol: String,
              boundary: Long, embargoLen: Long): DataFrame =
    assign(df, idxCol, boundary, embargoLen)
      .where(col("split").isNotNull)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(entityCol)).as("n_entities"))

  /** Entities present in BOTH train and test (the memorization leak an
    * embargo cannot absorb): (entity, n_train, n_test).
    */
  def entityLeakage(df: DataFrame, idxCol: String, entityCol: String,
                    boundary: Long, embargoLen: Long): DataFrame = {
    val tagged = assign(df, idxCol, boundary, embargoLen)
      .where(col(entityCol).isNotNull)
    val tr = tagged.where(col("split") === "train")
      .groupBy(col(entityCol)).agg(count(lit(1)).as("n_train"))
    val te = tagged.where(col("split") === "test")
      .groupBy(col(entityCol)).agg(count(lit(1)).as("n_test"))
    tr.join(te, Seq(entityCol))
  }

  /** DuckDB replay of [[summary]]. `rowsSql` yields (i, e). */
  def summaryOracle(rowsSql: String, boundary: Long, embargoLen: Long): String =
    s"""WITH a AS (SELECT CASE WHEN i IS NULL THEN NULL
    WHEN i < $boundary THEN 'train'
    WHEN i < $boundary + $embargoLen THEN 'embargo'
    ELSE 'test' END AS split, e
  FROM ($rowsSql))
SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(DISTINCT e) AS BIGINT) AS n_entities
FROM a WHERE split IS NOT NULL GROUP BY split ORDER BY split"""

  /** DuckDB replay of [[entityLeakage]]. `rowsSql` yields (i, e). */
  def leakageOracle(rowsSql: String, entityName: String, boundary: Long,
                    embargoLen: Long): String =
    s"""WITH a AS (SELECT i, e FROM ($rowsSql) WHERE e IS NOT NULL),
tr AS (SELECT e, CAST(count(*) AS BIGINT) AS n_train FROM a
  WHERE i < $boundary GROUP BY e),
te AS (SELECT e, CAST(count(*) AS BIGINT) AS n_test FROM a
  WHERE i >= $boundary + $embargoLen GROUP BY e)
SELECT tr.e AS $entityName, tr.n_train, te.n_test
FROM tr JOIN te ON tr.e = te.e ORDER BY tr.e"""
}
