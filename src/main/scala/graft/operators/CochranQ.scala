package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cochran's Q — the k-treatment generalization of [[McNemar]]: did ANY
  * of k models/variants differ on the same examples (k binary outcomes
  * per item)? Running pairwise McNemar k² times inflates the family
  * error; Q is the one omnibus test (reject → drill into pairs, ideally
  * under [[Fdr.holmDecisions]]). At k = 2, Q reduces ALGEBRAICALLY to
  * the McNemar statistic — (b10 − b01)²/(b10 + b01) — which the spec
  * pins as an identity.
  *
  * Entirely exact. With G_j the successes of treatment j, L_i the
  * successes of item i, T = ΣG = ΣL, the textbook Q = k(k−1)·Σ(G_j −
  * T/k)²/(kΣL_i − ΣL_i²) cross-multiplies (ΣG = T collapses the
  * square) to
  *
  *   Q = (k−1)·(k·ΣG_j² − T²) / (k·ΣL_i − ΣL_i²)
  *
  * — one non-negative q6 floor division (numerator ≥ 0 by
  * Cauchy–Schwarz) over DECIMAL(38,0). Denominator 0 means every item
  * was all-0 or all-1 — no discordance, the statistic is undefined →
  * NULL (the McNemar convention).
  *
  * Contracts IN-PLAN: every item must carry exactly one outcome per
  * treatment (k rows, k distinct treatments — an unbalanced panel
  * raises); outcomes are 0/1; NULL item/treatment/outcome rows drop;
  * NULL groups are real strata. Scale shape: item-level and
  * treatment-level partial-agg collapses to 1-row-per-group frames —
  * a billion (item, treatment) outcomes cost two grouped passes.
  */
object CochranQ {

  val Scale = 1000000L

  /** One row per group: (groupCol, n_items, k, q_q6). */
  def test(df: DataFrame, groupCol: String, itemCol: String,
           treatCol: String, outcomeCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, outcomeCol, "cochranQ")
    val dec = "decimal(38,0)"
    val rows = df
      .where(col(itemCol).isNotNull && col(treatCol).isNotNull &&
        col(outcomeCol).isNotNull)
      .select(col(groupCol), col(itemCol).as("__i"), col(treatCol).as("__t"),
        when(!col(outcomeCol).cast("long").isin(0L, 1L), raise_error(concat(
          lit("cochranQ: outcome must be 0 or 1, got "),
          col(outcomeCol).cast("string"))).cast("long"))
          .otherwise(col(outcomeCol).cast("long")).as("__x"))
    val perItem = rows.groupBy(col(groupCol), col("__i"))
      .agg(count(lit(1)).as("__cnt"),
        count_distinct(col("__t")).as("__dst"),
        sum(col("__x")).as("__L"))
    val itemAgg = perItem.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__N"),
        min(col("__cnt")).as("__cmin"), max(col("__cnt")).as("__cmax"),
        min(col("__dst")).as("__dmin"),
        sum(col("__L")).as("__T"),
        sum(col("__L") * col("__L")).as("__L2"))
    // NB each grouping level gets a FRESH key name: re-grouping by the
    // same aliased name makes Spark 4's qualified column resolution see
    // the attribute twice (AMBIGUOUS_REFERENCE on the self-join)
    val treatAgg = rows
      .select(col(groupCol).as("__g2"), col("__t"), col("__x"))
      .groupBy(col("__g2"), col("__t"))
      .agg(sum(col("__x")).as("__G"))
      .groupBy(col("__g2").as("__g3"))
      .agg(count(lit(1)).as("__k"),
        sum(col("__G").cast(dec) * col("__G")).as("__G2"))
    itemAgg.join(treatAgg, itemAgg(groupCol) <=> treatAgg("__g3"))
      .select(itemAgg(groupCol), {
        val balanced = col("__cmin") === col("__k") &&
          col("__cmax") === col("__k") && col("__dmin") === col("__k")
        when(!balanced, raise_error(concat(
          lit("cochranQ: every item needs exactly one outcome per " +
            "treatment (k = "), col("__k").cast("string"),
          lit(") — unbalanced panels are a different design"))).cast("long"))
          .when(col("__k") < 2L, raise_error(
            lit("cochranQ: needs at least 2 treatments")).cast("long"))
          .otherwise(col("__N")).as("n_items")
      },
        col("__k").as("k"), {
          val k = col("__k").cast(dec); val t = col("__T").cast(dec)
          val num = (k - lit(1)) * (k * col("__G2") - t * t)
          val den = k * col("__T").cast(dec) - col("__L2").cast(dec)
          when(den > 0,
            call_function("div", num * Scale, den).cast("long"))
        }.as("q_q6"))
  }

  /** DuckDB replay of [[test]]; `rowsSql` yields (grp, item, treat, x). */
  def oracleSql(rowsSql: String, groupName: String): String =
    s"""WITH rows_ AS (
  SELECT grp, item, treat, x FROM ($rowsSql)
  WHERE item IS NOT NULL AND treat IS NOT NULL AND x IS NOT NULL),
ia AS (
  SELECT grp, count(*) AS n, sum(l) AS t, sum(l * l) AS l2
  FROM (SELECT grp, item, sum(x) AS l FROM rows_ GROUP BY grp, item)
  GROUP BY grp),
ta AS (
  SELECT grp, count(*) AS k, sum(CAST(g AS HUGEINT) * g) AS g2
  FROM (SELECT grp, treat, sum(x) AS g FROM rows_ GROUP BY grp, treat)
  GROUP BY grp)
SELECT ia.grp AS $groupName, CAST(ia.n AS BIGINT) AS n_items,
  CAST(ta.k AS BIGINT) AS k,
  CASE WHEN CAST(ta.k AS HUGEINT) * ia.t - ia.l2 > 0 THEN CAST(
    ((ta.k - 1) * (CAST(ta.k AS HUGEINT) * ta.g2
      - CAST(ia.t AS HUGEINT) * ia.t) * $Scale)
    // (CAST(ta.k AS HUGEINT) * ia.t - ia.l2) AS BIGINT) END AS q_q6
FROM ia JOIN ta ON ia.grp IS NOT DISTINCT FROM ta.grp
ORDER BY $groupName"""
}
