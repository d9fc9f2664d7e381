package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global quantile bucketing (NTILE) without a global sort — assign
  * every row its k-quantile bucket by exact rank on (orderCol, idCol). The
  * curriculum primitive: bucket documents by difficulty / quality score
  * into k tiers, then schedule training over tiers; also the exact form of
  * equal-frequency binning for feature discretization.
  *
  * The naive formulation — `ntile(k) OVER (ORDER BY v)` — funnels the
  * entire corpus through ONE task (empty-partition window). This
  * implementation computes the same answer from a range repartition:
  *
  *  1. `repartitionByRange(v, id)` puts rows in globally ordered
  *     partitions (sampled boundaries — affects the SPLIT, never the
  *     result);
  *  2. a per-partition sort (parallel, spill-backed) plus
  *     [[graft.core.DenseIndex]]'s tiny offset pass yields each row's
  *     exact 0-based global rank;
  *  3. bucket follows from (rank, n, k) by NTILE's integer size rule —
  *     first `n mod k` buckets hold `⌈n/k⌉` rows, the rest `⌊n/k⌋`.
  *
  * Total cost: one range exchange + parallel sorts + a numPartitions-row
  * offset pass — nothing corpus-wide in one task. Ties: the idCol
  * tiebreak makes the order total, so ranks (hence buckets) are unique
  * and engine-independent.
  */
object QuantileBuckets {

  /** Input columns plus `bucket` (1-based, 1..k). `idCol` must be a
    * unique non-null key (the tiebreak that makes NTILE deterministic).
    */
  def ntileExact(df: DataFrame, orderCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val sorted = df.repartitionByRange(col(orderCol), col(idCol))
      .sortWithinPartitions(orderCol, idCol)
    // Pinned: a range exchange's layout is not deterministic across
    // evaluations (see withDenseIndexPinned) — unpinned, the rank pass
    // and the offsets pass can disagree on partition boundaries
    val ranked = graft.core.DenseIndex.withDenseIndexPinned(sorted, "__rank")
    // count from the RAW input, not the ranked frame: the total row count
    // doesn't need the range sort, so the expensive sorted lineage has ONE
    // consumer (DenseIndex's own two passes are inherent and documented)
    val nDf = df.agg(count(lit(1)).cast(LongType).as("__n"))
    // NTILE size rule in pure integer arithmetic: q = n div k, r = n mod k;
    // 0-based rank i → bucket (0-based) = i div (q+1) when i < r*(q+1)
    // (the widened buckets), else r + (i − r*(q+1)) div q. q = 0 (k > n)
    // never reaches the second branch: r = n and every i < n = r*(q+1).
    val bucket0 = expr(
      s"""CASE WHEN __rank < (__n % $k) * (__n div $k + 1)
         THEN __rank div (__n div $k + 1)
         ELSE (__n % $k) + (__rank - (__n % $k) * (__n div $k + 1)) div (__n div $k)
         END""")
    ranked.crossJoin(broadcast(nDf))
      .withColumn("bucket", (bucket0 + 1).cast(LongType))
      .drop("__rank", "__n")
  }

  /** DuckDB replay — the window NTILE the distributed form is provably
    * equivalent to (the oracle can afford the single-partition window).
    * NULLS FIRST spelled out: Spark's ascending sorts put NULLs first,
    * DuckDB's default is NULLS LAST — a NULL-bearing order column would
    * silently diverge otherwise.
    */
  def oracleSql(table: String, orderCol: String, idCol: String, k: Int,
                keepCols: Seq[String]): String = {
    val cols = keepCols.mkString(", ")
    s"""SELECT $cols, CAST(ntile($k) OVER (ORDER BY $orderCol NULLS FIRST, $idCol) AS BIGINT) AS bucket
FROM $table ORDER BY $orderCol NULLS FIRST, $idCol""".stripMargin
  }

  /** Quantile-CUTPOINT bucketing — the cheaper production path when exact
    * NTILE's range repartition is overkill: ONE KLL-summary aggregate over
    * the value column yields the k−1 cut values (discrete quantiles at
    * i/k), and bucket assignment is scan-stage arithmetic against the
    * broadcast cut array — `1 + |{cuts < v}|`, so bucket boundaries sit ON
    * corpus values and ties share a bucket (equal values can never split,
    * unlike [[ntileExact]]'s id tiebreak).
    *
    * Cost: one partial-agg'd aggregate (the KLL buffer is O(k·log(n/k))
    * per partition) + a 1-row broadcast — NO repartition of the data, no
    * sort, no second shuffle. Sketch capacity ≥ distinct weight mass makes
    * the cuts exact (the [[graft.functions.QuantileSketch]] exact regime —
    * the gate runs there); at 100 TB the same code runs approximate with
    * KLL's rank-error guarantee.
    */
  def bucketByCutpoints(df: DataFrame, valueCol: String, k: Int,
                        sketchK: Int = 4096): DataFrame = {
    require(k > 1, s"k must be at least 2, got $k")
    // the sketch operates on longs; a fractional column would silently
    // truncate (scores in [0,1) all collapse to 0) — fail fast instead,
    // callers scale to integer units first (cents, basis points, micros)
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"bucketByCutpoints needs an integral value column (scale fractional " +
          s"values to integer units first); $valueCol is ${other.catalogString}")
    }
    val fracs = (1L until k.toLong).map(i => (i, k.toLong))
    val cuts = df.agg(
      graft.functions.Quantiles(sketchK, fracs)(col(valueCol)).as("__cuts"))
    df.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        (aggregate(col("__cuts"), lit(0L),
          (acc, c) => acc + when(c < col(valueCol).cast("long"), 1L).otherwise(0L)) + 1L)
          .cast(LongType))
      .drop("__cuts")
  }

  /** DuckDB replay of [[bucketByCutpoints]] in the exact regime: cut i =
    * the smallest value whose cumulative count reaches ⌈i·n/k⌉ (the KLL
    * finish rule with unit weights), bucket = 1 + count of cuts strictly
    * below the value.
    */
  def cutpointsOracleSql(table: String, valueSql: String, k: Int,
                         keepCols: Seq[String]): String = {
    val cols = keepCols.mkString(", ")
    s"""WITH v AS (SELECT $valueSql AS v FROM $table),
c AS (SELECT v, sum(count(*)) OVER (ORDER BY v) AS cum FROM v GROUP BY v),
n AS (SELECT count(*) AS n FROM v),
cuts AS (
  SELECT i, min(c.v) AS cut
  FROM (SELECT unnest(range(1, $k)) AS i), c, n
  WHERE c.cum >= (i * n.n + $k - 1) // $k
  GROUP BY i)
SELECT $cols,
  1 + (SELECT count(*) FROM cuts WHERE cuts.cut < ($valueSql)) AS bucket
FROM $table t""".stripMargin
  }
}
