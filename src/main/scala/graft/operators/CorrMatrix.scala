package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass correlation matrix — all pairwise Pearson components for k
  * declared columns in ONE corpus scan: [[GroupedTrend.correlation]]
  * answers one pair per pass, so a k-feature screen re-reads a 100 TB
  * fact table k(k−1)/2 times; this accumulates every Σxᵢ and Σxᵢxⱼ in
  * one partial-agg'd aggregate (k + k(k+1)/2 decimal partials per
  * group-partition) and derives each pair's exact integers from the
  * single moment row — the scan count is 1 whatever k.
  *
  * Per pair (a, b), the L134 components: corr_num = n·Σab − Σa·Σb and
  * the two variances n·Σx² − (Σx)², published as canonical decimal
  * strings (the portable exact form — 128-bit integers hash
  * differently across engines); r = corr_num/√(var_a·var_b) is one
  * caller-side double. Rows with a NULL in ANY declared column drop
  * (complete-case — the one-pass moment sharing is exactly what
  * pairwise-complete semantics would forfeit); columns must be
  * integer-valued (cents/bp-quantize upstream). NULL groups are a real
  * stratum; a constant column yields var = 0 (callers treat the pair
  * as undefined).
  */
object CorrMatrix {

  private val Dec = "decimal(38,0)"

  /** (groupCols*, col_a, col_b, n, corr_num, var_a, var_b) — one row
    * per unordered pair, col_a < col_b in the declared order.
    */
  def matrix(df: DataFrame, groupCols: Seq[String],
             cols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    cols.foreach(c => graft.Guards.requireIntegral(df, c, "matrix"))
    // k + k(k+1)/2 multiply-accumulates per row run in the map stage —
    // fan the projected rows out when the scan came in as a single split
    // (guide §2.5; no-op at scale where splits >= cores). The exchange
    // carries LONGS (8 bytes, codegen'd writers); the decimal widening
    // happens after it, inside the aggregate.
    val complete = graft.Guards.fanOut(
      df.where(cols.map(col(_).isNotNull).reduce(_ && _))
        .select(groupCols.map(col) ++
          cols.map(c => col(c).cast("long").as(s"__v_$c")): _*))
    // per-row products in exact LONG arithmetic (ANSI raises loudly if
    // |a·b| ever exceeds 2⁶³ — the quantized-units contract); each
    // moment accumulates via [[graft.ExactSum.sumLong]] (three
    // codegen'd long limb sums, recombined to the identical
    // decimal(38,0) once per group) instead of a per-row BigDecimal add
    val moments =
      Seq(count(lit(1)).as("__n")) ++
        cols.map(c => graft.ExactSum.sumLong(col(s"__v_$c")).as(s"__s_$c")) ++
        cols.indices.flatMap(i => (i until cols.size).map { j =>
          val (a, b) = (cols(i), cols(j))
          graft.ExactSum.sumLong(col(s"__v_$a") * col(s"__v_$b"))
            .as(s"__q_${a}_$b")
        })
    val agg = complete.groupBy(groupCols.map(col): _*)
      .agg(moments.head, moments.tail: _*)
    val nD = col("__n").cast(Dec)
    def varOf(c: String): Column =
      nD * col(s"__q_${c}_$c") - col(s"__s_$c") * col(s"__s_$c")
    val pairRows = cols.indices.flatMap(i =>
      ((i + 1) until cols.size).map { j =>
        val (a, b) = (cols(i), cols(j))
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          (nD * col(s"__q_${a}_$b") - col(s"__s_$a") * col(s"__s_$b"))
            .cast("string").as("corr_num"),
          varOf(a).cast("string").as("var_a"),
          varOf(b).cast("string").as("var_b"))
      })
    agg.select(groupCols.map(col) :+ col("__n").as("n") :+
        explode(array(pairRows: _*)).as("__p"): _*)
      .select(groupCols.map(col) ++ Seq(col("__p.col_a"), col("__p.col_b"),
        col("n"), col("__p.corr_num"), col("__p.var_a"),
        col("__p.var_b")): _*)
  }

  /** DuckDB replay of [[matrix]] — one HUGEINT moment row per group,
    * pairs unioned from it in the same declared order.
    */
  def oracleSql(table: String, groupCols: Seq[String],
                colSqls: Seq[(String, String)]): String = {
    val g = groupCols.mkString(", ")
    val names = colSqls.map(_._1)
    val moments =
      names.map(c => s"sum(v_$c) AS s_$c") ++
        names.indices.flatMap(i => (i until names.size).map { j =>
          val (a, b) = (names(i), names(j))
          s"sum(v_$a * v_$b) AS q_${a}_$b"
        })
    val pairs = names.indices.flatMap(i => ((i + 1) until names.size).map {
      j =>
        val (a, b) = (names(i), names(j))
        s"""SELECT $g, '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n,
  CAST(n * q_${a}_$b - s_$a * s_$b AS VARCHAR) AS corr_num,
  CAST(n * q_${a}_$a - s_$a * s_$a AS VARCHAR) AS var_a,
  CAST(n * q_${b}_$b - s_$b * s_$b AS VARCHAR) AS var_b
FROM m"""
    })
    s"""WITH c AS (
  SELECT $g, ${colSqls.map { case (n, e) =>
        s"CAST($e AS HUGEINT) AS v_$n" }.mkString(", ")}
  FROM $table
  WHERE ${colSqls.map(c => s"(${c._2}) IS NOT NULL").mkString(" AND ")}),
m AS (
  SELECT $g, CAST(count(*) AS HUGEINT) AS n, ${moments.mkString(", ")}
  FROM c GROUP BY $g)
SELECT * FROM (${pairs.mkString("\nUNION ALL\n")})
ORDER BY $g, col_a, col_b"""
  }
}
