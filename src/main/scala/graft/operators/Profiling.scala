package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators: fixed-bin histograms and per-column summary
  * stats — the ANALYZE-style pass a pipeline runs before choosing join
  * strategies, salt factors, and bucket counts. Everything is one partial-
  * agg'd aggregation over the scan (no second pass, no collect of row
  * data), so profiling 100 TB costs one read.
  */
object Profiling {

  /** Fixed-width histogram of `c` over [lo, hi): bin i = floor((x−lo)/w),
    * clamped into [0, nBins−1] so outliers land in the edge bins; one
    * groupBy on a small int key (partial-agg'd, ≤nBins rows out). The bin
    * formula is plain IEEE arithmetic — engine-replayable.
    */
  def histogram(df: DataFrame, c: Column, lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
    val w = (hi - lo) / nBins
    val bin = least(greatest(floor((c.cast("double") - lo) / w), lit(0.0)), lit((nBins - 1).toDouble))
      .cast("long")
    df.where(c.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  def histogramOracle(table: String, expr: String, lo: Double, hi: Double,
                      nBins: Int): String = {
    val w = s"((${hi}) - (${lo})) / $nBins"
    s"""SELECT CAST(least(greatest(floor((CAST($expr AS DOUBLE) - ($lo)) / ($w)), 0), ${nBins - 1}) AS BIGINT) AS bin,
count(*) AS n FROM $table WHERE $expr IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Per-column profile, melted to one row per column: rows, nulls,
    * distincts, min/max (as strings — one schema across types). Exact
    * distinct counts; for quick profiling of ultra-wide tables swap in the
    * KMV estimator ([[graft.functions.BottomK.kmvEstimate]]). All columns
    * profile in ONE aggregation pass over the scan.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val melted = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
    }
    one.select(explode(array(melted: _*)).as("p")).select("p.*")
  }

  def profileOracle(table: String, cols: Seq[String]): String = {
    val rows = cols.map { c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s FROM $table"""
    }
    rows.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  /** Functional-dependency violation scan: the keys where `lhsCols` does
    * NOT determine `rhsCol` — data-contract mining ("is part → supplier
    * really 1:1?") and the precursor to choosing dedup/merge keys.
    * Physical shape (Spark's single-distinct rewrite): rows partial-
    * aggregate map-side to (lhs, rhs) pairs → exchange on the pair →
    * pairs partial-aggregate to lhs → exchange on lhs — TWO exchanges,
    * but the second carries distinct PAIRS (dependency-violation-sized),
    * never raw rows, and both are map-side-collapsed first. Only
    * violating keys come back — output is violation-sized, not key-sized.
    * NULL LHS values group like values ([[graft.operators.Anonymity]]'s
    * rule: a missing field narrows identity like a present one); NULL RHS
    * counts as a distinct outcome only alongside non-NULLs via the
    * separate `n_rhs_null` column (countDistinct ignores NULLs, so a key
    * whose RHS is always NULL has n_rhs_values = 0 — not a violation).
    */
  def fdViolations(df: DataFrame, lhsCols: Seq[String], rhsCol: String): DataFrame = {
    require(lhsCols.nonEmpty, "lhsCols must be non-empty")
    df.groupBy(lhsCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(rhsCol)).as("n_rhs_values"),
        sum(when(col(rhsCol).isNull, 1L).otherwise(0L)).as("n_rhs_null"))
      .where(col("n_rhs_values") > 1 ||
        (col("n_rhs_values") >= 1 && col("n_rhs_null") > 0))
  }

  /** Join-key concentration report — the "measure before you salt"
    * diagnostic feeding [[SkewJoin]] decisions: key cardinality, the
    * whale key's row count, and the Herfindahl concentration index as an
    * exact integer (hhi_q = ⌊10⁶·Σnᵢ²/N²⌋ ∈ [0, 10⁶]; 10⁶ = one key owns
    * everything, 10⁶/n_keys = uniform). Squares accumulate in
    * DECIMAL(38,0) (a 10¹²-row key squares to 10²⁴ — past BIGINT, inside
    * decimal), division is a single integer div both engines truncate
    * identically. One partial-agg'd groupBy + one aggregate over the
    * counts table (key-sized, not row-sized) — profiling a 100 TB join
    * key costs one read.
    */
  def keyConcentration(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val dec = "decimal(38,0)"
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("__n")).as("n_rows"),
        max(col("__n")).as("max_key_rows"),
        sum((col("__n").cast(dec) * col("__n").cast(dec)).cast(dec)).as("__sq"))
      .select(col("n_keys"), col("n_rows"), col("max_key_rows"),
        expr(s"CAST((__sq * 1000000) div (CAST(n_rows AS $dec) * CAST(n_rows AS $dec)) AS BIGINT)")
          .as("hhi_q"))
  }

  /** DuckDB replay of [[keyConcentration]] (HUGEINT squares). */
  def keyConcentrationOracle(table: String, keyCols: Seq[String]): String = {
    val g = keyCols.mkString(", ")
    s"""WITH c AS (SELECT $g, CAST(count(*) AS HUGEINT) AS n FROM $table GROUP BY $g)
       |SELECT CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(max(n) AS BIGINT) AS max_key_rows,
       |  CAST((sum(n * n) * 1000000) // (sum(n) * sum(n)) AS BIGINT) AS hhi_q
       |FROM c""".stripMargin
  }

  /** Shannon entropy of a column's value distribution, quantized to
    * micro-nats (the [[Drift]] ln discipline: per-value contribution
    * ⌊10⁶·(nᵢ/N)·ln(N/nᵢ)⌋, exact integers cross-engine) — the
    * uniformity screen that catches near-constant columns (entropy ≈ 0:
    * useless as a feature or join key) and near-unique ones (entropy ≈
    * ln N: a key, not a category) in one number. NULLs are excluded from
    * the distribution and reported separately. One partial-agg'd value
    * count + one value-sized aggregate; the total rides a 1-row
    * broadcast, never a second corpus pass.
    */
  def columnEntropy(df: DataFrame, c: String): DataFrame = {
    // ONE corpus pass: NULL groups like any value in the count table
    // (value-sized), then every output derives from that table — the
    // persist spans the totals and contribution jobs so the groupBy's
    // corpus scan runs once (ContextCleaner reclaims the blocks)
    val counts = df.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.agg(
      coalesce(sum(when(col("__v").isNotNull, lit(1L))), lit(0L)).as("n_values"),
      coalesce(sum(when(col("__v").isNotNull, col("__n"))), lit(0L)).as("n_rows"),
      coalesce(sum(when(col("__v").isNull, col("__n"))), lit(0L)).as("n_nulls"))
    val contrib = floor(lit(1000000.0) *
      (col("__n").cast("double") / col("n_rows").cast("double")) *
      log(col("n_rows").cast("double") / col("__n").cast("double")))
      .cast("long")
    val entq = counts.where(col("__v").isNotNull)
      .crossJoin(broadcast(totals.select("n_rows")))
      .agg(coalesce(sum(contrib), lit(0L)).as("entropy_q"))
    totals.crossJoin(broadcast(entq))
      .select(col("n_values"), col("n_rows"), col("n_nulls"), col("entropy_q"))
  }

  /** DuckDB replay of [[columnEntropy]] — same double chain, same floor;
    * scalar subqueries keep it ONE row even for an empty or all-NULL
    * column (the operator's documented edge).
    */
  def columnEntropyOracle(table: String, c: String): String =
    s"""WITH cnt AS (SELECT $c AS v, count(*) AS n FROM $table GROUP BY 1),
       |nt AS (SELECT
       |  CAST(coalesce(count(*) FILTER (WHERE v IS NOT NULL), 0) AS BIGINT) AS n_values,
       |  CAST(coalesce(sum(n) FILTER (WHERE v IS NOT NULL), 0) AS BIGINT) AS n_rows,
       |  CAST(coalesce(sum(n) FILTER (WHERE v IS NULL), 0) AS BIGINT) AS n_nulls
       |  FROM cnt)
       |SELECT nt.n_values, nt.n_rows, nt.n_nulls,
       |  coalesce((SELECT CAST(sum(CAST(floor(1000000.0
       |    * (CAST(n AS DOUBLE) / CAST(nt.n_rows AS DOUBLE))
       |    * ln(CAST(nt.n_rows AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)) AS BIGINT)
       |    FROM cnt WHERE v IS NOT NULL), 0) AS entropy_q
       |FROM nt""".stripMargin

  /** Referential-integrity audit — the FK sibling of [[fdViolations]]:
    * how many child rows point at no parent, and how many distinct
    * orphan keys there are. One anti-join on the key (broadcast when the
    * parent key set fits, shuffled equi-join otherwise — Catalyst's
    * call) + one aggregate; NULL child keys are reported separately
    * (SQL FK semantics: NULL references nothing and violates nothing).
    */
  def fkOrphans(child: DataFrame, parent: DataFrame,
                childKey: String, parentKey: String): DataFrame = {
    val nonNull = child.where(col(childKey).isNotNull)
    val orphans = nonNull.join(
      parent.select(col(parentKey).as(childKey)).where(col(childKey).isNotNull),
      Seq(childKey), "left_anti")
    val base = child.agg(
      count(lit(1)).as("n_child_rows"),
      sum(when(col(childKey).isNull, 1L).otherwise(0L)).as("n_null_keys"))
    val orph = orphans.agg(
      count(lit(1)).as("n_orphan_rows"),
      countDistinct(col(childKey)).as("n_orphan_keys"))
    base.crossJoin(orph)
  }

  /** DuckDB replay of [[fkOrphans]]. `parentSql` is a subquery yielding
    * the parent key column.
    */
  def fkOrphansOracle(childTable: String, parentSql: String,
                      childKey: String, parentKey: String): String =
    s"""WITH o AS (SELECT c.$childKey FROM $childTable c
       |  WHERE c.$childKey IS NOT NULL
       |    AND NOT EXISTS (SELECT 1 FROM ($parentSql) p
       |                    WHERE p.$parentKey = c.$childKey))
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM $childTable) AS n_child_rows,
       |  (SELECT CAST(coalesce(count(*) FILTER (WHERE $childKey IS NULL), 0) AS BIGINT)
       |     FROM $childTable) AS n_null_keys,
       |  CAST(count(*) AS BIGINT) AS n_orphan_rows,
       |  CAST(count(DISTINCT $childKey) AS BIGINT) AS n_orphan_keys
       |FROM o""".stripMargin

  /** DuckDB replay of [[fdViolations]]. */
  def fdViolationsOracle(table: String, lhsCols: Seq[String], rhsCol: String): String = {
    val g = lhsCols.mkString(", ")
    s"""SELECT $g, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(count(DISTINCT $rhsCol) AS BIGINT) AS n_rhs_values,
       |  CAST(coalesce(count(*) FILTER (WHERE $rhsCol IS NULL), 0) AS BIGINT) AS n_rhs_null
       |FROM $table GROUP BY $g
       |HAVING count(DISTINCT $rhsCol) > 1
       |  OR (count(DISTINCT $rhsCol) >= 1
       |      AND count(*) FILTER (WHERE $rhsCol IS NULL) > 0)
       |ORDER BY $g""".stripMargin
  }
  /** One-pass table profile with BOUNDED state — the corpus-scale
    * sibling of [[profile]]: that one's exact `count_distinct` plans a
    * per-column distinct expansion (state proportional to each column's
    * cardinality); this one carries a fixed k-length KMV sketch per
    * column instead, so profiling a 100-column, 10⁹-distinct table is
    * still one scan with k·100 longs of aggregate state. Values canonicalize to their string form with NULL mapped to
    * a sentinel ("<NULL>" — so a column's NULL presence shows up as one
    * distinct value, deterministically on any engine); columns whose
    * string rendering is engine-dependent (doubles/floats) are REJECTED —
    * scale or cast upstream; the contract is integers/strings/dates.
    *
    * The estimate is the exact-replayable KMV of [[graft.functions.BottomK]]
    * (L43): exact below k distinct values, (k−1)·M/h_k beyond — no RNG,
    * no HLL seed, oracle-checkable bit-for-bit.
    */
  def tableProfile(df: DataFrame, cols: Seq[String], k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    // the integers/strings/dates contract is ENFORCED, not just
    // documented: a float column's string rendering is engine-dependent
    // (Spark vs DuckDB CAST AS VARCHAR differ), so est_distinct would
    // quietly diverge from any oracle — fail loudly instead
    cols.foreach { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          throw new IllegalArgumentException(
            s"tableProfile cannot profile float column $c: its string " +
              "rendering is engine-dependent — scale to integer units or " +
              "cast to DECIMAL/STRING upstream")
        case _ => ()
      }
    }
    val m60 = 1L << 60
    // positional agg aliases (__nn_0, __sk_0): a DOTTED profiled column
    // would break an unquoted col("__nn_a.b") lookup (parsed as a struct
    // path), and names never collide with user columns
    def esc(c: String) = col(s"`$c`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val sc = coalesce(esc(c).cast("string"), lit("<NULL>"))
      Seq(
        count(esc(c)).as(s"__nn_$i"),
        graft.functions.BottomK.distinct(k)(
          graft.text.TextFunctions.fingerprint(sc)).as(s"__sk_$i"))
    }
    val allAggs = count(lit(1)).as("__n") +: aggs
    val one = df.agg(allAggs.head, allAggs.tail: _*)
    val rows = array(cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_$i").as("n_nonnull"),
        (col("__n") - col(s"__nn_$i")).as("n_null"),
        graft.functions.BottomK.kmvEstimate(col(s"__sk_$i"), k, m60)
          .as("est_distinct"),
        size(col(s"__sk_$i")).cast("long").as("sk_size"))
    }: _*)
    one.select(explode(rows).as("p")).select(
      col("p.col_name"), col("p.n_rows"), col("p.n_nonnull"), col("p.n_null"),
      col("p.est_distinct"), col("p.sk_size"))
  }

  /** DuckDB replay of [[tableProfile]] — per-column UNION ALL over the
    * same sentinel/fingerprint/KMV arithmetic.
    */
  def tableProfileOracle(table: String, cols: Seq[String], k: Int = 64): String = {
    val m60 = 1L << 60
    val parts = cols.map { c =>
      val sc = s"coalesce(CAST($c AS VARCHAR), '<NULL>')"
      val hv = s"CAST(('0x'||substr(md5($sc),1,15)) AS BIGINT)"
      s"""SELECT '$c' AS col_name, n.n_rows, n.n_nonnull,
  n.n_rows - n.n_nonnull AS n_null,
  CASE WHEN d.nd < $k THEN CAST(d.nd AS DOUBLE)
       ELSE ${(k - 1).toDouble} * $m60 / d.hk END AS est_distinct,
  CAST(least(d.nd, $k) AS BIGINT) AS sk_size
FROM (SELECT CAST(count(*) AS BIGINT) AS n_rows,
    CAST(count($c) AS BIGINT) AS n_nonnull FROM $table) n,
  (SELECT CAST(count(*) AS BIGINT) AS nd,
     CAST(min(CASE WHEN rk = $k THEN hv END) AS DOUBLE) AS hk
   FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rk
     FROM (SELECT DISTINCT $hv AS hv FROM $table))) d"""
    }
    parts.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

}
