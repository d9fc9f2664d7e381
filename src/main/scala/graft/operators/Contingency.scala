package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact chi-square contingency analysis between two categorical columns
  * — the feature-independence scan (is `lang` independent of `source`?
  * does a quality label correlate with a domain?) run before
  * stratification or leakage audits.
  *
  * The chi-square cell contribution is RATIONAL in the counts:
  *
  *   (o − e)²/e  with  e = r·c/T   ⟹   (o·T − r·c)² / (T·r·c)
  *
  * so with counts in DECIMAL(38,0) every cell is exact integer
  * arithmetic, quantized by one truncating division (numerator and
  * denominator are non-negative — no floor/truncate divergence). The
  * statistic is the sum of the quantized contributions (truncation ≤ 1
  * unit per cell, deterministic on any engine). Magnitude bound: the
  * quantization multiplies the squared difference by Scale BEFORE the
  * division, so (o·T − r·c)²·10⁶ ≤ T⁴·10⁶ must fit DECIMAL(38) ⇒
  * T ≤ ~10⁸ rows (NOT T⁴ alone; [[cramersV]] and the DuckDB HUGEINT
  * oracle share the same d²·Scale product and the same bound — r10
  * review). Beyond that, pre-aggregate the pair counts upstream and
  * feed them scaled.
  *
  * Scale shape: ONE shuffle — the (a, b) pair count with map-side
  * partials; the margins are re-aggregates of the CELL table (|A|·|B|
  * rows, not corpus rows) and ride broadcast joins back onto it.
  *
  * Reference scope note: fabrix has no statistics operators — extension
  * surface beside [[GroupedTrend]] and [[Profiling]].
  */
object Contingency {

  /** Quantization scale for cell contributions. */
  val Scale: Long = 1000000L

  /** Per-cell table: (aCol, bCol, o, contrib_q) — observed count and the
    * quantized chi-square contribution of every observed cell.
    * (Unobserved cells contribute r·c/T² · SCALE... — i.e. e·SCALE — to
    * the true statistic; with every VALUE PAIR observed this is the full
    * statistic. Cells with o = 0 simply don't appear, and [[chiSquare]]
    * documents the convention.)
    */
  def cells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cellCounts = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).cast(dec).as("o"))
      .localCheckpoint(false)
    val ra = cellCounts.groupBy(col(aCol))
      .agg(sum(col("o")).cast(dec).as("r"))
    val cb = cellCounts.groupBy(col(bCol))
      .agg(sum(col("o")).cast(dec).as("c"))
    val tot = cellCounts.agg(sum(col("o")).cast(dec).as("t"))
    cellCounts
      .join(broadcast(ra), aCol)
      .join(broadcast(cb), bCol)
      .crossJoin(broadcast(tot))
      .withColumn("__d", (col("o") * col("t") - col("r") * col("c")).cast(dec))
      .select(col(aCol), col(bCol), col("o").cast("long").as("o"),
        expr(s"CAST((CAST(__d * __d AS DECIMAL(38,0)) * $Scale) div " +
          "CAST(t * r * c AS DECIMAL(38,0)) AS BIGINT)").as("contrib_q"))
  }

  /** The chi-square statistic (in 1/SCALE units) over observed cells,
    * with the degrees of freedom (|A|−1)·(|B|−1): one row
    * (chi2_q, dof).
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cl = cells(df, aCol, bCol)
    cl.agg(
      sum(col("contrib_q")).as("chi2_q"),
      ((countDistinct(col(aCol)) - 1) *
        (countDistinct(col(bCol)) - 1)).as("dof"))
  }

  /** Cramér's V — the chi-square statistic normalized into a
    * comparable [0, 1] effect size (χ² grows with n and table size, so
    * raw χ² can't rank column pairs; V can): V² = χ²/(n·min(|A|−1,
    * |B|−1)). Unlike [[chiSquare]]'s observed-cell convention, the
    * UNOBSERVED cells' mass matters here (at perfect association the
    * off-diagonal zeros carry a third of the statistic — without them
    * V² tops out below 1), so the full statistic is assembled as
    * Σ observed contrib_q + (Scale·n − Σ observed ⌊Scale·e⌋): the
    * unobserved expectation mass via Σ_all e = n, every term floored
    * per cell (declared, replayable). `v2_q6 = ⌊chi2_full_q/(n·min)⌋`
    * — a second declared truncation, √ left to the reader (the Q14
    * convention). One row: (n, chi2_full_q, dof, min_dim, v2_q6);
    * single-category axes report NULL (no variation to associate).
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cellCounts = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).cast(dec).as("o"))
      .localCheckpoint(false)
    val ra = cellCounts.groupBy(col(aCol))
      .agg(sum(col("o")).cast(dec).as("__mr"))
    val cb = cellCounts.groupBy(col(bCol))
      .agg(sum(col("o")).cast(dec).as("__mc"))
    val tot = cellCounts.agg(sum(col("o")).cast(dec).as("__mt"))
    val joined = cellCounts
      .join(broadcast(ra), aCol)
      .join(broadcast(cb), bCol)
      .crossJoin(broadcast(tot))
      .withColumn("__d",
        (col("o") * col("__mt") - col("__mr") * col("__mc")).cast(dec))
      .withColumn("__contrib", expr(
        s"CAST((CAST(__d * __d AS DECIMAL(38,0)) * $Scale) div " +
          "CAST(__mt * __mr * __mc AS DECIMAL(38,0)) AS DECIMAL(38,0))"))
      .withColumn("__eq", expr(
        s"CAST((CAST(__mr * __mc AS DECIMAL(38,0)) * $Scale) div " +
          "CAST(__mt AS DECIMAL(38,0)) AS DECIMAL(38,0))"))
    joined.agg(
        sum(col("o")).cast(dec).as("__n"),
        sum(col("__contrib")).cast(dec).as("__sc"),
        sum(col("__eq")).cast(dec).as("__se"),
        countDistinct(col(aCol)).as("__na"),
        countDistinct(col(bCol)).as("__nb"))
      .select(
        col("__n").cast("long").as("n"),
        (col("__sc") + col("__n") * lit(Scale).cast(dec) - col("__se"))
          .cast("long").as("chi2_full_q"),
        ((col("__na") - 1) * (col("__nb") - 1)).as("dof"),
        least(col("__na") - 1, col("__nb") - 1).as("min_dim"),
        when(least(col("__na") - 1, col("__nb") - 1) <= 0,
          lit(null).cast("long"))
          .otherwise(call_function("div",
            col("__sc") + col("__n") * lit(Scale).cast(dec) - col("__se"),
            col("__n") * least(col("__na") - 1, col("__nb") - 1).cast(dec))
            .cast("long"))
          .as("v2_q6"))
  }

  /** DuckDB replay of [[cramersV]] — same margins, same per-cell floors,
    * same unobserved-mass assembly.
    */
  def cramersVOracle(table: String, aCol: String, bCol: String): String =
    s"""WITH cc AS (SELECT $aCol, $bCol, CAST(count(*) AS HUGEINT) AS o
  FROM $table WHERE $aCol IS NOT NULL AND $bCol IS NOT NULL GROUP BY $aCol, $bCol),
ra AS (SELECT $aCol, sum(o) AS r FROM cc GROUP BY $aCol),
cb AS (SELECT $bCol, sum(o) AS c FROM cc GROUP BY $bCol),
tot AS (SELECT sum(o) AS t FROM cc),
j AS (SELECT cc.$aCol, cc.$bCol, o, r, c, t,
    ((o * t - r * c) * (o * t - r * c) * $Scale) // (t * r * c) AS contrib,
    (r * c * $Scale) // t AS eq
  FROM cc JOIN ra USING ($aCol) JOIN cb USING ($bCol), tot),
a AS (SELECT sum(o) AS n, sum(contrib) AS sc, sum(eq) AS se,
    count(DISTINCT $aCol) AS na, count(DISTINCT $bCol) AS nb FROM j)
SELECT CAST(n AS BIGINT) AS n,
  CAST(sc + n * $Scale - se AS BIGINT) AS chi2_full_q,
  CAST((na - 1) * (nb - 1) AS BIGINT) AS dof,
  CAST(least(na - 1, nb - 1) AS BIGINT) AS min_dim,
  CASE WHEN least(na - 1, nb - 1) <= 0 THEN NULL
       ELSE CAST((sc + n * $Scale - se) // (n * least(na - 1, nb - 1))
         AS BIGINT) END AS v2_q6
FROM a"""

  /** Per-cell MUTUAL-INFORMATION contributions — the dependence MEASURE
    * where chi-square is the dependence TEST: MI = Σ p_ij·ln(p_ij/(p_i·p_j))
    * in nats quantifies HOW MUCH one column tells you about the other
    * (feature selection ranks predictors by it). Same one-shuffle /
    * margins-rebroadcast shape as [[cells]]; per cell the integer counts
    * are exact and the single ln is quantized (the [[Drift]] discipline):
    * `mi_q = ⌊SCALE · (o/T) · ln(o·T/(r·c))⌋` with the ratio formed by
    * one cross-multiplied double division. Unobserved cells contribute 0
    * to true MI (p·ln p → 0), so the observed-cell sum IS the statistic —
    * cleaner than chi-square's convention. Sum `mi_q` for total MI (in
    * 1/SCALE nats; truncation ≤ 1 unit per observed cell).
    */
  def mutualInfoCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cellCounts = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).cast(dec).as("o"))
      .localCheckpoint(false)
    // margin aliases are double-underscored so a user column literally
    // named "r"/"c"/"t" can't ambiguate the joins (bit a spec in r10)
    val ra = cellCounts.groupBy(col(aCol))
      .agg(sum(col("o")).cast(dec).as("__mi_r"))
    val cb = cellCounts.groupBy(col(bCol))
      .agg(sum(col("o")).cast(dec).as("__mi_c"))
    val tot = cellCounts.agg(sum(col("o")).cast(dec).as("__mi_t"))
    val p = col("o").cast("double") / col("__mi_t").cast("double")
    val ratio = (col("o").cast("double") * col("__mi_t").cast("double")) /
      (col("__mi_r").cast("double") * col("__mi_c").cast("double"))
    cellCounts
      .join(broadcast(ra), aCol)
      .join(broadcast(cb), bCol)
      .crossJoin(broadcast(tot))
      .select(col(aCol), col(bCol), col("o").cast("long").as("o"),
        floor(lit(Scale.toDouble) * (p * log(ratio))).cast("long").as("mi_q"))
  }

  /** Pairwise mutual-information SWEEP over a column list — the
    * dependence SCAN a leakage/redundancy audit runs before feature
    * selection ("which categorical columns secretly encode each
    * other"): for every unordered column pair, total MI = Σ of
    * [[mutualInfoCells]]'s per-cell quantized terms (per-term floors
    * sum exactly — the established discipline, so the matrix
    * hash-gates) plus the cell count as the effect-size context. The
    * analog of the numeric corr-matrix for categorical columns.
    * One cells-sized aggregate per pair; |cols|² pairs DECLARED small
    * (a feature audit, not a corpus op).
    */
  def miMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"miMatrix needs >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "duplicate columns in miMatrix")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    pairs.map { case (a, b) =>
      mutualInfoCells(df, a, b)
        .agg(count(lit(1)).as("n_cells"), sum(col("mi_q")).as("mi_q"))
        .select(lit(a).as("col_a"), lit(b).as("col_b"),
          col("n_cells"), col("mi_q"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB replay of [[miMatrix]] — the per-pair oracles aggregated
    * and unioned in the same pair order.
    */
  def miMatrixOracle(table: String, cols: Seq[String]): String = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
  CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(mi_q) AS BIGINT) AS mi_q
FROM (${mutualInfoOracle(table, a, b)})"""
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_a, col_b"
  }

  /** DuckDB replay of [[mutualInfoCells]] — same counts, same double
    * chain, same quantized ln.
    */
  def mutualInfoOracle(table: String, aCol: String, bCol: String): String =
    s"""WITH cc AS (SELECT $aCol, $bCol, CAST(count(*) AS BIGINT) AS o
  FROM $table WHERE $aCol IS NOT NULL AND $bCol IS NOT NULL GROUP BY $aCol, $bCol),
ra AS (SELECT $aCol, CAST(sum(o) AS BIGINT) AS r FROM cc GROUP BY $aCol),
cb AS (SELECT $bCol, CAST(sum(o) AS BIGINT) AS c FROM cc GROUP BY $bCol),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM cc)
SELECT cc.$aCol, cc.$bCol, o,
  CAST(floor($Scale.0 * ((CAST(o AS DOUBLE) / CAST(t AS DOUBLE))
    * ln((CAST(o AS DOUBLE) * CAST(t AS DOUBLE))
      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))))) AS BIGINT) AS mi_q
FROM cc JOIN ra USING ($aCol) JOIN cb USING ($bCol), tot
ORDER BY cc.$aCol, cc.$bCol""".stripMargin

  /** DuckDB replay of [[cells]] — HUGEINT margins, same truncating
    * division.
    */
  def cellsOracle(table: String, aCol: String, bCol: String): String =
    s"""WITH cc AS (SELECT $aCol, $bCol, CAST(count(*) AS HUGEINT) AS o
  FROM $table WHERE $aCol IS NOT NULL AND $bCol IS NOT NULL GROUP BY $aCol, $bCol),
ra AS (SELECT $aCol, sum(o) AS r FROM cc GROUP BY $aCol),
cb AS (SELECT $bCol, sum(o) AS c FROM cc GROUP BY $bCol),
tot AS (SELECT sum(o) AS t FROM cc)
SELECT cc.$aCol, cc.$bCol, CAST(o AS BIGINT) AS o,
  CAST(((o * t - r * c) * (o * t - r * c) * ${Scale}) // (t * r * c) AS BIGINT) AS contrib_q
FROM cc JOIN ra USING ($aCol) JOIN cb USING ($bCol), tot"""
}
