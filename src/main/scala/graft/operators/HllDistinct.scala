package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct counting — the fixed-1024-register member of the
  * sketch family beside [[DistinctStore]]'s KMV: KMV keeps the k
  * smallest hashes (k longs per group, exact below k), HLL keeps one
  * 6-bit register per bucket (1024 bytes per group FOREVER, ~3% error at
  * any cardinality) — the sketch you pick when groups are many and
  * memory per group must be constant. Flajolet's estimator is usually
  * run in floats end-to-end; here every decision is exact so the DuckDB
  * oracle replays the WHOLE algorithm:
  *
  *   - hash: the repo's 60-bit md5 fingerprint (bit-identical
  *     cross-engine; no RNG, no seed) — top 10 bits pick the bucket,
  *     the remaining 50 give the rank ρ = 51 − bitlength(rem) (rem = 0
  *     ⇒ ρ = 51), via `bin()` string length on BOTH engines;
  *   - the harmonic sum Σ 2^(−Mⱼ) is a sum of dyadic rationals — scaled
  *     by 2^51 it is an EXACT BIGINT (≤ 2^61), so the raw estimate
  *     α·m²/Σ becomes one truncating division of exact integers with
  *     α = 0.7213/(1 + 1.079/m) carried as the exact rational
  *     7213·m / (10000·m + 10790);
  *   - the small-range branch (E ≤ 2.5m AND empty buckets exist) is
  *     decided by cross-multiplication (2·num ≤ 5m·den — never a float
  *     compare), and linear counting ⌊m·ln(m/V)⌋ is the one
  *     deterministic double chain (the [[Profiling.columnEntropy]] ln
  *     discipline: single expression, single floor).
  *
  * Values hash by exact string form — float/double value columns are
  * rejected loudly (engine-dependent rendering; the
  * [[Profiling.tableProfile]] contract). NULLs are excluded (COUNT
  * DISTINCT semantics), NULL groups are a real stratum.
  *
  * Scale shape: ONE partial-agg'd (group, bucket) max — a value
  * repeated 10⁹× is one ρ candidate absorbed map-side, and per-group
  * shuffle state is ≤1024 register rows regardless of corpus size; the
  * estimate is a registers-sized re-aggregate. The registers frame is
  * itself mergeable (max per bucket), so stores/streams fold exactly
  * like [[DistinctStore.update]].
  */
object HllDistinct {

  /** Bucket-index bits (m = 1024 registers). */
  val BucketBits = 10
  val Buckets: Long = 1L << BucketBits
  /** Hash bits left for the rank after the bucket index. */
  val RemBits: Int = 60 - BucketBits
  /** Maximum rank: all RemBits zero. */
  val MaxRho: Int = RemBits + 1
  private val RemMask = (1L << RemBits) - 1

  /** Exact α·m³·2^MaxRho numerator: 7213·m·m²·2^51 = 7213·2^81. */
  private val AlphaNum = BigInt(7213) << (2 * BucketBits + BucketBits + MaxRho)
  /** Exact α denominator: 10000·m + 10790. */
  private val AlphaDen = 10000L * Buckets + 10790L

  private def requireHashable(df: DataFrame, c: String): Unit = {
    val dt = df.schema(c).dataType
    require(!dt.isInstanceOf[org.apache.spark.sql.types.FloatType] &&
      !dt.isInstanceOf[org.apache.spark.sql.types.DoubleType],
      s"hllDistinct hashes the exact string form of '$c' — float/double " +
        "renderings are engine-dependent; cast to decimal/string upstream")
  }

  /** Register table: (groupCols*, bucket, m_j) — non-empty buckets only
    * (an absent bucket IS the empty register). Mergeable by max(m_j).
    */
  def registers(df: DataFrame, groupCols: Seq[String],
                valueCol: String): DataFrame = {
    requireHashable(df, valueCol)
    val h = graft.text.TextFunctions.hash60(col(valueCol).cast("string"))
    val rem = h.bitwiseAND(lit(RemMask))
    val rho = when(rem === 0L, lit(MaxRho.toLong))
      .otherwise(lit(MaxRho.toLong) - length(bin(rem)).cast("long"))
    df.where(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+
        shiftrightunsigned(h, RemBits).as("bucket") :+ rho.as("__rho")): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("__rho")).as("m_j"))
  }

  /** (groupCols*, v_empty, est_distinct, method) — method is 'lc'
    * (linear counting, small range) or 'raw' (the harmonic estimator).
    */
  def estimate(df: DataFrame, groupCols: Seq[String],
               valueCol: String): DataFrame =
    estimateFromRegisters(registers(df, groupCols, valueCol), groupCols)

  /** Estimate from a (merged) register table — the store-fold entry. */
  def estimateFromRegisters(regs: DataFrame,
                            groupCols: Seq[String]): DataFrame = {
    val dec = "decimal(38,0)"
    val perGroup = regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n_obs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($MaxRho - m_j AS INT))"))
          .as("__s_obs"))
    val vEmpty = lit(Buckets) - col("__n_obs")
    val sNum = col("__s_obs") + vEmpty * lit(1L << MaxRho)
    val num = lit(AlphaNum.toString).cast(dec)
    val den = sNum.cast(dec) * lit(AlphaDen).cast(dec)
    val raw = call_function("div", num, den)
    val lc = floor(lit(Buckets.toDouble) *
      log(lit(Buckets.toDouble) / vEmpty.cast("double"))).cast("long")
    val useLc = vEmpty > 0L &&
      num * lit(2).cast(dec) <= den * lit(5L * Buckets).cast(dec)
    perGroup.select((groupCols.map(col) :+
      vEmpty.as("v_empty") :+
      when(useLc, lc).otherwise(raw).as("est_distinct") :+
      when(useLc, lit("lc")).otherwise(lit("raw")).as("method")): _*)
  }

  /** DuckDB replay of [[estimate]] — the full algorithm: same hash, same
    * register max, exact HUGEINT harmonic sum, cross-multiplied branch,
    * same single-double-chain linear counting.
    */
  def oracleSql(table: String, groupCols: Seq[String], valueSql: String,
                extraCols: String = ""): String = {
    val g = groupCols.mkString(", ")
    val gr = groupCols.map(c => s"r.$c").mkString(", ")
    s"""WITH b AS (
  SELECT $g, (CAST(('0x'||substr(md5(CAST($valueSql AS VARCHAR)),1,15)) AS BIGINT) >> $RemBits) AS bucket,
    CASE WHEN (CAST(('0x'||substr(md5(CAST($valueSql AS VARCHAR)),1,15)) AS BIGINT) & $RemMask) = 0 THEN $MaxRho
         ELSE $MaxRho - length(bin(CAST(('0x'||substr(md5(CAST($valueSql AS VARCHAR)),1,15)) AS BIGINT) & $RemMask)) END AS rho
  FROM $table WHERE ($valueSql) IS NOT NULL),
r AS (SELECT $g, bucket, max(rho) AS mj FROM b GROUP BY $g, bucket),
s AS (SELECT $gr, CAST(count(*) AS BIGINT) AS n_obs,
    CAST(sum(CAST(1 AS BIGINT) << ($MaxRho - mj)) AS BIGINT) AS s_obs
  FROM r GROUP BY $gr),
e AS (SELECT $g, CAST($Buckets - n_obs AS BIGINT) AS v_empty,
    CAST('$AlphaNum' AS HUGEINT) AS num,
    (CAST(s_obs AS HUGEINT) + CAST($Buckets - n_obs AS HUGEINT)
      * (CAST(1 AS HUGEINT) << $MaxRho)) * $AlphaDen AS den
  FROM s)
SELECT $g, v_empty,
  CAST(CASE WHEN v_empty > 0 AND 2 * num <= ${5L * Buckets} * den
    THEN CAST(floor(${Buckets.toDouble} * ln(${Buckets.toDouble} / CAST(v_empty AS DOUBLE))) AS HUGEINT)
    ELSE num // den END AS BIGINT) AS est_distinct,
  CASE WHEN v_empty > 0 AND 2 * num <= ${5L * Buckets} * den
    THEN 'lc' ELSE 'raw' END AS method$extraCols
FROM e ORDER BY $g"""
  }
}
