package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distribution drift between two dataset versions — the per-bucket
  * Population Stability Index table: PSI_i = (p_i − q_i)·ln(p_i/q_i),
  * PSI = Σ_i. The ML-ops screen run before every retrain ("did the score
  * / length / quality distribution move since the reference snapshot?")
  * and the monitoring side of [[SnapshotDiff]] — diff audits identity,
  * drift audits shape.
  *
  * Cross-engine exactness, the [[graft.text.Collocations]] discipline:
  * bucket counts are exact integers; each bucket's p, q, and p/q are ONE
  * double division/ratio of those integers (identical op chain both
  * engines); the single `ln` is quantized to `⌊SCALE·(p−q)·ln(p/q)⌋` so
  * the per-bucket longs — and any sum of them — hash-match. (Same 1-ulp
  * ln caveat as PMI/BM25: log libraries agree empirically.)
  *
  * Buckets come from FIXED cut points (train-time artifacts, e.g. from
  * [[QuantileBuckets.bucketByCutpoints]] on the reference snapshot) —
  * drift must be measured against a frozen binning, or the binning
  * itself absorbs the drift. A bucket empty on either side contributes
  * NULL psi_q (ln would be ±∞); standard practice — smooth upstream if
  * those buckets must count.
  *
  * Scale shape: one partial-agg'd groupBy per side on the ≤|cuts|+1
  * bucket ids (map-side collapse — a whale bucket is one hot counter), a
  * buckets-sized full-outer join, corpus totals as 1-row broadcasts.
  * Nothing corpus-wide shuffles but the two count aggregates.
  */
object Drift {

  private val Scale = 1000000L

  /** Bucket id: 1 + |{cuts < v}| — [[QuantileBuckets.bucketByCutpoints]]'
    * assignment arithmetic against literal cuts. Public so a streaming
    * ingest can bucket rows before folding them into a count store.
    */
  def psiBucketColumn(v: Column, cuts: Seq[Long]): Column = bucketOf(v, cuts)

  private def bucketOf(v: Column, cuts: Seq[Long]): Column =
    (aggregate(array(cuts.map(lit): _*), lit(0L),
      (acc, c) => acc + when(c < v.cast(LongType), 1L).otherwise(0L)) + 1L)
      .cast(LongType)

  /** Per-bucket drift table: (bucket, n_ref, n_cur, psi_q) for every
    * bucket occupied on either side; `psi_q = ⌊10⁶·(p−q)·ln(p/q)⌋`, NULL
    * when a side is empty. Rows with NULL `valueCol` are excluded (they
    * have no bucket).
    */
  def psiByBucket(ref: DataFrame, cur: DataFrame, valueCol: String,
                  cuts: Seq[Long]): DataFrame = {
    require(cuts.nonEmpty, "cuts must be non-empty")
    require(cuts == cuts.sorted && cuts.distinct == cuts,
      "cuts must be strictly increasing")
    // same integral-only guard as QuantileBuckets.bucketByCutpoints: a
    // fractional score column would truncate every value (and Spark
    // truncates where DuckDB rounds — the oracle would silently diverge)
    Seq(ref, cur).foreach(_.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"psiByBucket needs an integral value column (scale fractional values " +
          s"to integer units first); $valueCol is ${other.catalogString}")
    })
    psiFromCounts(bucketCounts(ref, valueCol, cuts, "n_ref"),
      bucketCounts(cur, valueCol, cuts, "n_cur"))
  }

  /** One side's bucket-count table (bucket, `out`) — the maintained-store
    * form of a distribution: feed it to [[graft.operators.IncrementalAgg]]
    * (group by bucket, Count) to keep the CURRENT side continuously
    * updated under streaming ingest, then [[psiFromCounts]] against the
    * frozen reference counts each batch — monitoring without re-scanning
    * history.
    */
  def bucketCounts(df: DataFrame, valueCol: String, cuts: Seq[Long],
                   out: String): DataFrame = df
    .where(col(valueCol).isNotNull)
    .select(bucketOf(col(valueCol), cuts).as("bucket"))
    .groupBy("bucket").agg(count(lit(1)).as(out))

  /** PSI from two bucket-count tables (`bucket`, `n_ref`) / (`bucket`,
    * `n_cur`) — the math stage of [[psiByBucket]], exposed so counts can
    * come from a maintained store instead of a corpus scan.
    */
  def psiFromCounts(r: DataFrame, c: DataFrame): DataFrame = {
    // totals from the buckets-sized count tables, NOT a second corpus
    // aggregate: every non-null row lands in exactly one bucket, so
    // N = Σ n_ref — two tiny sums whose exchanges Catalyst reuses with
    // the bucket counts, keeping the corpus passes at exactly two
    val totals = broadcast(
      r.agg(coalesce(sum("n_ref"), lit(0L)).as("__N"))
        .crossJoin(c.agg(coalesce(sum("n_cur"), lit(0L)).as("__M"))))
    val joined = r.join(c, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .crossJoin(totals)
    // identical double op chain on both engines: two divisions for p − q,
    // one cross-multiplied ratio for ln's argument, one ln, one floor
    val p = col("n_ref").cast(DoubleType) / col("__N").cast(DoubleType)
    val q = col("n_cur").cast(DoubleType) / col("__M").cast(DoubleType)
    val ratio = (col("n_ref").cast(DoubleType) * col("__M").cast(DoubleType)) /
      (col("n_cur").cast(DoubleType) * col("__N").cast(DoubleType))
    joined
      .withColumn("psi_q",
        when(col("n_ref") > 0 && col("n_cur") > 0,
          floor(lit(Scale.toDouble) * ((p - q) * log(ratio))).cast(LongType)))
      .drop("__N", "__M")
  }

  /** DuckDB replay of [[psiByBucket]] — same bucket arithmetic over the
    * literal cuts, same count joins, same double chain, same quantized ln.
    * `refSql` / `curSql` are subqueries yielding the value column.
    */
  def oracleSql(refSql: String, curSql: String, valueCol: String,
                cuts: Seq[Long]): String = {
    val bucket = cuts.map(cutoff =>
      s"(CASE WHEN $cutoff < CAST($valueCol AS BIGINT) THEN 1 ELSE 0 END)")
      .mkString("1 + ", " + ", "")
    s"""WITH r AS (SELECT CAST($bucket AS BIGINT) AS bucket, count(*) AS n_ref
  FROM ($refSql) WHERE $valueCol IS NOT NULL GROUP BY 1),
c AS (SELECT CAST($bucket AS BIGINT) AS bucket, count(*) AS n_cur
  FROM ($curSql) WHERE $valueCol IS NOT NULL GROUP BY 1),
nt AS (SELECT (SELECT count(*) FROM ($refSql) WHERE $valueCol IS NOT NULL) AS N,
              (SELECT count(*) FROM ($curSql) WHERE $valueCol IS NOT NULL) AS M)
SELECT coalesce(r.bucket, c.bucket) AS bucket,
  coalesce(r.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur,
  CASE WHEN coalesce(r.n_ref, 0) > 0 AND coalesce(c.n_cur, 0) > 0 THEN
    CAST(floor(${Scale}.0 * (
      (CAST(r.n_ref AS DOUBLE) / CAST(nt.N AS DOUBLE)
        - CAST(c.n_cur AS DOUBLE) / CAST(nt.M AS DOUBLE))
      * ln((CAST(r.n_ref AS DOUBLE) * CAST(nt.M AS DOUBLE))
        / (CAST(c.n_cur AS DOUBLE) * CAST(nt.N AS DOUBLE))))) AS BIGINT)
  END AS psi_q
FROM r FULL OUTER JOIN c ON r.bucket = c.bucket, nt
ORDER BY 1""".stripMargin
  }

  /** CATEGORICAL PSI — the same drift statistic over a category column's
    * shares instead of numeric cutpoint buckets (most production
    * features are categorical: country, device, source): each category
    * IS its bucket, same [[psiFromCounts]] math, same quantized-ln
    * double chain. Rows with a NULL category are excluded like the
    * numeric form's NULL values (count missingness with
    * [[Completeness]]; including NULL as a stratum would also break the
    * equi-join parity both engines share). Output (category, n_ref,
    * n_cur, psi_q) — `psi_q` NULL where a side is empty (the standard
    * "new/vanished category" signal, worth alerting on by itself).
    */
  def psiCategorical(ref: DataFrame, cur: DataFrame,
                     catCol: String): DataFrame = {
    def side(df: DataFrame, out: String) = df
      .where(col(catCol).isNotNull)
      .groupBy(col(catCol).as("bucket")).agg(count(lit(1)).as(out))
    psiFromCounts(side(ref, "n_ref"), side(cur, "n_cur"))
      .withColumnRenamed("bucket", "category")
  }

  /** DuckDB replay of [[psiCategorical]]. */
  def categoricalOracle(refSql: String, curSql: String,
                        catCol: String): String =
    s"""WITH r AS (SELECT $catCol AS b, count(*) AS n_ref
  FROM ($refSql) WHERE $catCol IS NOT NULL GROUP BY 1),
c AS (SELECT $catCol AS b, count(*) AS n_cur
  FROM ($curSql) WHERE $catCol IS NOT NULL GROUP BY 1),
nt AS (SELECT (SELECT count(*) FROM ($refSql) WHERE $catCol IS NOT NULL) AS N,
              (SELECT count(*) FROM ($curSql) WHERE $catCol IS NOT NULL) AS M)
SELECT coalesce(r.b, c.b) AS category,
  coalesce(r.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur,
  CASE WHEN coalesce(r.n_ref, 0) > 0 AND coalesce(c.n_cur, 0) > 0 THEN
    CAST(floor(${Scale}.0 * (
      (CAST(r.n_ref AS DOUBLE) / CAST(nt.N AS DOUBLE)
        - CAST(c.n_cur AS DOUBLE) / CAST(nt.M AS DOUBLE))
      * ln((CAST(r.n_ref AS DOUBLE) * CAST(nt.M AS DOUBLE))
        / (CAST(c.n_cur AS DOUBLE) * CAST(nt.N AS DOUBLE))))) AS BIGINT)
  END AS psi_q
FROM r FULL OUTER JOIN c ON r.b = c.b, nt
ORDER BY 1""".stripMargin
}
