package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Rank-biased overlap (RBO@k) — how similar two RANKINGS are, top-
  * weighted: [[RetrievalMetrics]] scores one ranking against ground
  * truth; RBO compares two rankings against each other (old index vs
  * new index, yesterday's feed vs today's, A/B ranker diff), weighting
  * agreement at rank 1 far above agreement at rank 50 — exactly what
  * plain Jaccard@k and Kendall's tau refuse to do.
  *
  * Truncated RBO with persistence p = pNum/pDen (declared semantics —
  * the standard RBO@k prefix sum; the geometric residual past k is the
  * caller's to report):
  *
  *   rbo = (1−p) Σ_{d=1..k} p^{d−1} · X_d / d
  *
  * where X_d = |top_d(A) ∩ top_d(B)|. A shared doc with ranks (ra, rb)
  * enters every depth d ≥ max(ra, rb), so X_d is ONE running sum over
  * the max-rank histogram — no per-depth set intersections. Every term
  * is an exact rational — (pDen−pNum)·pNum^{d−1}·X_d / (pDen^d·d) —
  * quantized per term to 10⁻⁶ (the per-term-floored discipline; k ≤ 30
  * keeps pDen^k·k·10⁶ inside DECIMAL(38,0) for pDen ≤ 10), with the
  * power constants emitted as exact integer literals on BOTH engines.
  *
  * Contracts: one row per (query, doc) and per (query, rank) on each
  * side — duplicates raise in-plan (a multiset "ranking" is not a
  * ranking); ranks are 1-based positives; queries present on only one
  * side score 0 overlap (rbo 0 rows, not absent — the honest "these
  * rankings share nothing"). Scale: the join is (query, doc)-keyed;
  * depth tables are k rows per query; windows are k-sized.
  */
object RankBiasedOverlap {

  val Scale = 1000000L

  /** (queryCol, n_common, rbo_q6). */
  def rbo(a: DataFrame, b: DataFrame, queryCol: String, docCol: String,
          rankCol: String, k: Int, pNum: Long, pDen: Long): DataFrame = {
    require(k >= 1 && k <= 30, s"k must be in [1, 30], got $k")
    require(pNum > 0 && pNum < pDen && pDen <= 10,
      s"persistence p = $pNum/$pDen must lie in (0, 1) with pDen <= 10")
    val spark = a.sparkSession
    import spark.implicits._
    def side(df: DataFrame, tag: String) = {
      graft.Guards.requireIntegral(df, rankCol, "rbo")
      // windows partition on the POST-rename attribute __r (a spec
      // naming the original rankCol would not resolve after the select)
      val perDoc = Window.partitionBy(col(queryCol), col(docCol))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val perRank = Window.partitionBy(col(queryCol), col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      df.where(col(queryCol).isNotNull && col(docCol).isNotNull &&
          col(rankCol).isNotNull)
        .select(col(queryCol), col(docCol),
          col(rankCol).cast(LongType).as("__r"))
        .withColumn("__nd", count(lit(1)).over(perDoc))
        .withColumn("__nr", count(lit(1)).over(perRank))
        .withColumn("__r",
          when(col("__nd") > 1 || col("__nr") > 1 || col("__r") < 1L,
            raise_error(concat(lit(s"rbo: side $tag is not a ranking — "),
              lit("duplicate doc/rank or rank < 1 in query '"),
              col(queryCol).cast("string"), lit("'")))
              .cast("long"))
          .otherwise(col("__r")))
        .select(col(queryCol), col(docCol), col("__r"))
    }
    val sa = side(a, "A"); val sb = side(b, "B")
    val m = sa.join(sb.select(col(queryCol), col(docCol),
        col("__r").as("__rb")), Seq(queryCol, docCol))
      .select(col(queryCol), greatest(col("__r"), col("__rb")).as("__m"))
      .where(col("__m") <= k)
    val hist = m.groupBy(col(queryCol), col("__m"))
      .agg(count(lit(1)).as("__hm"))
    val queries = sa.select(col(queryCol))
      .union(sb.select(col(queryCol))).distinct()
    val consts = (1 to k).map { d =>
      (d.toLong,
        (BigInt(pDen - pNum) * BigInt(pNum).pow(d - 1) * Scale).toString,
        (BigInt(pDen).pow(d) * d).toString)
    }.toDF("__d", "__num", "__den")
    val depths = queries.crossJoin(broadcast(consts))
    val run = Window.partitionBy(col(queryCol)).orderBy(col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = "decimal(38,0)"
    val hist2 = hist.select(col(queryCol).as("__hq"), col("__m"),
      col("__hm"))
    depths
      .join(hist2, col(queryCol) <=> col("__hq") &&
        col("__d") === col("__m"), "left_outer")
      .drop("__hq", "__m")
      .withColumn("__x", sum(coalesce(col("__hm"), lit(0L))).over(run))
      .withColumn("__term", call_function("div",
        col("__num").cast(dec) * col("__x").cast(dec),
        col("__den").cast(dec)))
      .groupBy(col(queryCol))
      .agg(max(col("__x")).as("n_common"),
        sum(col("__term")).cast(LongType).as("rbo_q6"))
  }

  /** DuckDB replay of [[rbo]] — same max-rank histogram, same exact
    * power literals (emitted by this builder, so both engines divide
    * identical integers). `aSql`/`bSql` must yield (q, doc, r).
    */
  def oracleSql(aSql: String, bSql: String, queryName: String, k: Int,
                pNum: Long, pDen: Long): String = {
    val consts = (1 to k).map { d =>
      val num = BigInt(pDen - pNum) * BigInt(pNum).pow(d - 1) * Scale
      val den = BigInt(pDen).pow(d) * d
      s"($d, CAST('$num' AS HUGEINT), CAST('$den' AS HUGEINT))"
    }.mkString(", ")
    s"""WITH sa AS (SELECT q, doc, CAST(r AS BIGINT) AS r FROM ($aSql)
  WHERE q IS NOT NULL AND doc IS NOT NULL AND r IS NOT NULL),
sb AS (SELECT q, doc, CAST(r AS BIGINT) AS r FROM ($bSql)
  WHERE q IS NOT NULL AND doc IS NOT NULL AND r IS NOT NULL),
m AS (SELECT sa.q, greatest(sa.r, sb.r) AS mx
  FROM sa JOIN sb ON sa.q IS NOT DISTINCT FROM sb.q AND sa.doc = sb.doc
  WHERE greatest(sa.r, sb.r) <= $k),
h AS (SELECT q, mx, CAST(count(*) AS BIGINT) AS hm FROM m GROUP BY 1, 2),
qs AS (SELECT DISTINCT q FROM (SELECT q FROM sa UNION ALL SELECT q FROM sb)),
c(d, num, den) AS (VALUES $consts),
dp AS (SELECT qs.q, c.d, c.num, c.den, coalesce(h.hm, 0) AS hm
  FROM qs CROSS JOIN c
  LEFT JOIN h ON h.q IS NOT DISTINCT FROM qs.q AND h.mx = c.d),
x AS (SELECT q, d, num, den,
    sum(hm) OVER (PARTITION BY q ORDER BY d ASC
      ROWS UNBOUNDED PRECEDING) AS xd
  FROM dp)
SELECT q AS $queryName, CAST(max(xd) AS BIGINT) AS n_common,
  CAST(sum((num * xd) // den) AS BIGINT) AS rbo_q6
FROM x GROUP BY q ORDER BY q"""
  }
}
