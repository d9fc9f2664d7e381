package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit and suppression over quasi-identifier columns — the
  * privacy screen a dataset runs before release or training: a
  * quasi-identifier combination shared by fewer than k rows re-identifies
  * its members (Sweeney 2002); the audit lists those combinations, the
  * suppression drops their rows.
  *
  * Null contract: NULL is a quasi-identifier VALUE (groupBy treats NULLs
  * as equal) — "(country=NULL, zip=12345)" is its own cohort, because a
  * missing field narrows identity exactly like a present one.
  *
  * Scale shape: the audit is ONE partial-agg'd groupBy on the
  * quasi-identifier tuple (whale cohorts collapse map-side); suppression
  * anti-joins the rows once against the violation list. The violation
  * list is NOT inherently small — a mostly-unique quasi-identifier tuple
  * (the typical failing dataset) makes nearly every cohort a violation,
  * so the join is left to Catalyst/AQE: it broadcasts when the list fits
  * and shuffles when it doesn't. No window, no second corpus pass.
  */
object Anonymity {

  /** Under-k cohorts: one row per quasi-identifier combination with fewer
    * than `k` members — (quasi cols..., n). Empty result = k-anonymous.
    */
  def audit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be at least 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") < k)
  }

  /** Rows whose quasi-identifier cohort has at least `k` members — the
    * released dataset. Implemented as a null-safe anti-join against the
    * under-k cohort list so NULL-valued cohorts suppress correctly too.
    * No broadcast hint: the violation list can approach corpus size on a
    * mostly-unique tuple, so the strategy choice stays with AQE.
    */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val bad = audit(df, quasiCols, k).drop("n")
    df.join(bad,
      quasiCols.map(c => df(c) <=> bad(c)).reduce(_ && _), "left_anti")
  }

  /** DuckDB replay of [[audit]]. */
  def auditOracleSql(table: String, quasiCols: Seq[String], k: Long): String = {
    val g = quasiCols.mkString(", ")
    s"SELECT $g, count(*) AS n FROM $table GROUP BY $g HAVING count(*) < $k ORDER BY $g"
  }

  /** DuckDB replay of [[suppress]] — the window form. */
  def suppressOracleSql(table: String, quasiCols: Seq[String], k: Long,
                        keepCols: Seq[String]): String = {
    val g = quasiCols.mkString(", ")
    val cols = keepCols.mkString(", ")
    s"""SELECT $cols FROM (
  SELECT *, count(*) OVER (PARTITION BY $g) AS __n FROM $table)
WHERE __n >= $k ORDER BY $cols""".stripMargin
  }

  /** l-diversity + t-closeness audit — the screens k-anonymity misses: a
    * 50-member cohort whose every member shares one disease is perfectly
    * k-anonymous and perfectly disclosive. Per quasi-identifier cohort:
    * `l_distinct` = distinct sensitive values (Machanavajjhala 2007), and
    * `tvd_bp` = total-variation distance between the cohort's sensitive
    * distribution and the corpus-wide one in basis points — the
    * categorical (uniform-ground-distance) instance of t-closeness's EMD
    * (Li 2007), exact in integers:
    * `⌊10⁴·Σ_v|c_gv·N − c_v·n_g| / (2·n_g·N)⌋` — the absent-value arm of
    * the Σ collapses to `(N − Σ_present c_v)·n_g`, so only PRESENT
    * (cohort, value) pairs ever materialize; no cohort × full-domain
    * cross join. Magnitudes ride DECIMAL(38,0) (c_gv·N is corpus²-sized);
    * only the BIGINT bp projection leaves.
    *
    * Shape: one partial-agg'd groupBy on (quasi, sensitive) — the ONLY
    * corpus-sized pass — then value-count and cohort-count aggregates
    * DERIVED from it (checkpointed once, the [[graft.text.VocabDrift]]
    * posture), a value-keyed equi-join, and a 1-row grand total crossed
    * in broadcast. A whale cohort collapses map-side.
    *
    * Contract: rows with NULL sensitive values drop first (a missing
    * sensitive attribute discloses nothing and must not dilute the
    * distance); NULL quasi values stay cohort-forming as in [[audit]].
    */
  def diversityAudit(df: DataFrame, quasiCols: Seq[String],
                     sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    val dec = "decimal(38,0)"
    val gv = df.where(col(sensitiveCol).isNotNull)
      .groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__cgv"))
      .localCheckpoint(true)
    val g = gv.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__cgv")).as("__ng"), count(lit(1)).as("l_distinct"))
    val v = gv.groupBy(col(sensitiveCol))
      .agg(sum(col("__cgv")).as("__cv"))
    val total = v.agg(sum(col("__cv")).cast("long").as("__N"))
    // null-safe cohort join: a NULL quasi value forms a cohort (the
    // [[audit]] contract) and a plain equi-join would silently drop it
    val gRen = quasiCols.foldLeft(g)((d, c) =>
      d.withColumnRenamed(c, s"__g_$c"))
    val joined = gv
      .join(v, sensitiveCol)
      .join(gRen, quasiCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _))
      .crossJoin(broadcast(total))
      .withColumn("__term",
        abs(col("__cgv").cast(dec) * col("__N") -
          col("__cv").cast(dec) * col("__ng")))
    joined
      .groupBy(quasiCols.map(col): _*)
      .agg(
        first(col("__ng")).as("__ngf"),
        first(col("l_distinct")).as("l_distinct"),
        ((sum(col("__term")) +
          (first(col("__N")).cast(dec) - sum(col("__cv").cast(dec))) *
            first(col("__ng")))
          * 10000).as("__num"),
        first(col("__N")).as("__Nf"))
      .select(
        quasiCols.map(col) ++ Seq(
          col("__ngf").as("n"),
          col("l_distinct"),
          // truncating integral div on the non-negative DECIMAL(38,0)
          // magnitude — matches the oracle's HUGEINT floor `//` exactly
          // (decimal `/` would round HALF_UP at scale 6 before the cast)
          expr("CAST(__num div (CAST(2 AS DECIMAL(38,0)) * __ngf * __Nf) " +
            "AS BIGINT)").as("tvd_bp")): _*)
  }

  /** DuckDB replay of [[diversityAudit]] — same present-pairs collapse,
    * HUGEINT magnitudes, one floor division to basis points.
    */
  def diversityOracleSql(table: String, quasiCols: Seq[String],
                         sensitiveCol: String): String = {
    val q = quasiCols.mkString(", ")
    val qg = quasiCols.map(c => s"gv.$c").mkString(", ")
    s"""WITH base AS (SELECT * FROM $table WHERE $sensitiveCol IS NOT NULL),
gv AS (SELECT $q, $sensitiveCol, CAST(count(*) AS HUGEINT) AS cgv
  FROM base GROUP BY $q, $sensitiveCol),
g AS (SELECT $q, CAST(sum(cgv) AS HUGEINT) AS ng,
    CAST(count(*) AS BIGINT) AS l_distinct FROM gv GROUP BY $q),
v AS (SELECT $sensitiveCol, CAST(sum(cgv) AS HUGEINT) AS cv
  FROM gv GROUP BY $sensitiveCol),
t AS (SELECT CAST(sum(cv) AS HUGEINT) AS N FROM v)
SELECT $qg, CAST(g.ng AS BIGINT) AS n, g.l_distinct,
  CAST((sum(abs(gv.cgv * t.N - v.cv * g.ng))
      + (t.N - sum(v.cv)) * g.ng) * 10000
    // (2 * g.ng * t.N) AS BIGINT) AS tvd_bp
FROM gv
JOIN v USING ($sensitiveCol)
JOIN g ON ${quasiCols.map(c => s"gv.$c IS NOT DISTINCT FROM g.$c").mkString(" AND ")}
CROSS JOIN t
GROUP BY $qg, g.ng, g.l_distinct, t.N
ORDER BY $qg""".stripMargin
  }
}
