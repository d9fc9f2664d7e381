package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise co-occurrence mining — which items appear together in the
  * same basket (order, session, document) at least `minCount` times:
  * the level-2 Apriori step behind "frequently bought together",
  * related-content suggestions, and tag-affinity analysis. Exact integer
  * counts; pairs are canonically ordered (item_a < item_b) so each
  * unordered pair counts once per basket.
  *
  * Scale shape: pair generation is a self-equi-join ON THE BASKET KEY
  * (never a cartesian) — O(Σ basket²) like every pairwise scheme, so the
  * whale-basket guard matters: baskets with more than `maxBasket`
  * DISTINCT items are EXCLUDED (a 10⁶-item basket would contribute
  * 5·10¹¹ pairs and, like a stopword in PMI, carries no affinity signal
  * anyway) and reported honestly via [[oversizedBaskets]] — the L90
  * truncation-visible discipline. Distinct-reduce before pairing:
  * duplicate (basket, item) rows collapse map-side, so quantity never
  * inflates co-occurrence.
  */
object CoOccurrence {

  /** (item_a, item_b, n_baskets) for pairs co-occurring in ≥ `minCount`
    * qualifying baskets (≤ `maxBasket` distinct items each).
    */
  def pairs(df: DataFrame, basketCol: String, itemCol: String,
            minCount: Long, maxBasket: Int = 1000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val qualified = qualifiedItems(df, basketCol, itemCol, maxBasket)
    pairCounts(qualified, minCount, "n_baskets")
      .select(col("__ia").as("item_a"), col("__ib").as("item_b"),
        col("n_baskets"))
  }

  /** Item-item cosine similarity — the normalization step that turns raw
    * co-occurrence into a recommender neighborhood: `sim(a,b) =
    * n_ab / √(n_a·n_b)` (the binary-vector cosine), so a pair's count is
    * judged against how common its items are — 50 co-baskets mean
    * everything for two niche items and nothing for two bestsellers.
    * Published EXACTLY as `sim2_e8 = ⌊10⁸·n_ab² / (n_a·n_b)⌋` — the
    * SQUARED cosine in 1e−8 units: squaring is monotone on the
    * non-negative cosine, so thresholding and ranking are preserved and
    * no square root (float) ever enters the result. DECIMAL(38,0)
    * magnitudes (n_ab² is corpus²-sized), BIGINT out (≤ 10⁸ by
    * Cauchy–Schwarz).
    *
    * Supports `n_i` count QUALIFIED baskets only (same `maxBasket`
    * exclusion as the pair counts — a mixed-universe cosine would exceed
    * 1.0). Scale shape: [[pairs]]' posture plus two joins against the
    * |items|-sized support table (broadcast-eligible, AQE-planned).
    *
    * `minSim2E8` prunes AFTER the exact arithmetic — correctness never
    * depends on it; it is the knob that keeps "everything is weakly
    * similar to everything" output bounded.
    */
  def cosineNeighbors(df: DataFrame, basketCol: String, itemCol: String,
                      minCount: Long, minSim2E8: Long,
                      maxBasket: Int = 1000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(minSim2E8 >= 0 && minSim2E8 <= 100000000L,
      s"minSim2E8 must be in [0, 1e8], got $minSim2E8")
    val dec = "decimal(38,0)"
    val qualified = qualifiedItems(df, basketCol, itemCol, maxBasket)
      .localCheckpoint(true)
    val support = qualified.groupBy(col("__i").as("__si"))
      .agg(count(lit(1)).as("__n"))
    val co = pairCounts(qualified, minCount, "n_ab")
      .select(col("__ia").as("item_a"), col("__ib").as("item_b"),
        col("n_ab"))
    co
      .join(support.select(col("__si").as("item_a"), col("__n").as("n_a")), "item_a")
      .join(support.select(col("__si").as("item_b"), col("__n").as("n_b")), "item_b")
      .withColumn("sim2_e8", expr(
        s"CAST((CAST(n_ab AS $dec) * n_ab * 100000000) div " +
          s"(CAST(n_a AS $dec) * n_b) AS BIGINT)"))
      .where(col("sim2_e8") >= minSim2E8)
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("sim2_e8"))
  }

  /** DuckDB replay of [[cosineNeighbors]]. */
  def cosineOracle(table: String, basketCol: String, itemCol: String,
                   minCount: Long, minSim2E8: Long,
                   maxBasket: Int = 1000): String =
    s"""WITH bi AS (SELECT DISTINCT $basketCol AS b, $itemCol AS i FROM $table
  WHERE $basketCol IS NOT NULL AND $itemCol IS NOT NULL),
q AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= $maxBasket),
qi AS (SELECT b, i FROM bi WHERE b IN (SELECT b FROM q)),
s AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM qi GROUP BY i),
co AS (SELECT a.i AS item_a, c.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM qi a JOIN qi c ON a.b = c.b AND a.i < c.i
  GROUP BY 1, 2 HAVING count(*) >= $minCount)
SELECT co.item_a, co.item_b, co.n_ab, sa.n AS n_a, sb.n AS n_b,
  CAST((CAST(co.n_ab AS HUGEINT) * co.n_ab * 100000000)
    // (CAST(sa.n AS HUGEINT) * sb.n) AS BIGINT) AS sim2_e8
FROM co JOIN s sa ON co.item_a = sa.i JOIN s sb ON co.item_b = sb.i
WHERE (CAST(co.n_ab AS HUGEINT) * co.n_ab * 100000000)
    // (CAST(sa.n AS HUGEINT) * sb.n) >= $minSim2E8
ORDER BY 1, 2""".stripMargin

  /** Directed association rules a→b over the co-occurrence pairs — the
    * classic market-basket readout ("customers who bought a also bought
    * b"), each metric an EXACT integer in 1e−8 units so the mining run
    * hashes cross-engine:
    *
    *   support_e8 = ⌊10⁸·n_ab / N⌋        (how common the pair is)
    *   conf_e8    = ⌊10⁸·n_ab / n_a⌋      (P(b | a) — direction matters)
    *   lift_e8    = ⌊10⁸·n_ab·N / (n_a·n_b)⌋  (association vs chance;
    *                10⁸ = independent, above = positive association)
    *
    * over the QUALIFIED-basket universe (N counts those baskets — a
    * mixed universe would let lift exceed its meaning, the
    * [[cosineNeighbors]] rule). Each unordered pair emits both
    * directions; `minConfE8` prunes AFTER the exact arithmetic.
    * All quantities non-negative, so truncating div IS floor on both
    * engines. Scale shape: [[pairs]]' posture + two |items|-sized
    * support joins + a 1-row broadcast total.
    */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
            minCount: Long, minConfE8: Long,
            maxBasket: Int = 1000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(minConfE8 >= 0 && minConfE8 <= 100000000L,
      s"minConfE8 must be in [0, 1e8], got $minConfE8")
    val dec = "decimal(38,0)"
    val qualified = qualifiedItems(df, basketCol, itemCol, maxBasket)
      .localCheckpoint(true)
    val support = qualified.groupBy(col("__i").as("__si"))
      .agg(count(lit(1)).as("__n"))
    val totals = qualified.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__N"))
    val co = pairCounts(qualified, minCount, "n_ab")
    val both = co
      .select(col("__ia").as("antecedent"), col("__ib").as("consequent"),
        col("n_ab"))
      .unionAll(co.select(col("__ib").as("antecedent"),
        col("__ia").as("consequent"), col("n_ab")))
    both
      .join(support.select(col("__si").as("antecedent"), col("__n").as("n_ante")),
        "antecedent")
      .join(support.select(col("__si").as("consequent"), col("__n").as("n_cons")),
        "consequent")
      .crossJoin(broadcast(totals))
      .withColumn("support_e8",
        expr(s"CAST((CAST(n_ab AS $dec) * 100000000) div __N AS BIGINT)"))
      .withColumn("conf_e8",
        expr(s"CAST((CAST(n_ab AS $dec) * 100000000) div n_ante AS BIGINT)"))
      .withColumn("lift_e8",
        expr(s"CAST((CAST(n_ab AS $dec) * __N * 100000000) div " +
          s"(CAST(n_ante AS $dec) * n_cons) AS BIGINT)"))
      .where(col("conf_e8") >= minConfE8)
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_ante"), col("n_cons"), col("support_e8"), col("conf_e8"),
        col("lift_e8"))
  }

  /** DuckDB replay of [[rules]] — same qualified universe, both rule
    * directions, HUGEINT floor divisions.
    */
  def rulesOracle(table: String, basketCol: String, itemCol: String,
                  minCount: Long, minConfE8: Long,
                  maxBasket: Int = 1000): String =
    s"""WITH bi AS (SELECT DISTINCT $basketCol AS b, $itemCol AS i FROM $table
  WHERE $basketCol IS NOT NULL AND $itemCol IS NOT NULL),
q AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= $maxBasket),
qi AS (SELECT b, i FROM bi WHERE b IN (SELECT b FROM q)),
s AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM qi GROUP BY i),
tot AS (SELECT CAST(count(DISTINCT b) AS HUGEINT) AS N FROM qi),
co AS (SELECT a.i AS ia, c.i AS ib, CAST(count(*) AS BIGINT) AS n_ab
  FROM qi a JOIN qi c ON a.b = c.b AND a.i < c.i
  GROUP BY 1, 2 HAVING count(*) >= $minCount),
bd AS (
  SELECT ia AS antecedent, ib AS consequent, n_ab FROM co
  UNION ALL
  SELECT ib AS antecedent, ia AS consequent, n_ab FROM co),
r AS (SELECT bd.antecedent, bd.consequent, bd.n_ab,
    sa.n AS n_ante, sb.n AS n_cons,
    CAST((CAST(bd.n_ab AS HUGEINT) * 100000000) // tot.N AS BIGINT) AS support_e8,
    CAST((CAST(bd.n_ab AS HUGEINT) * 100000000) // sa.n AS BIGINT) AS conf_e8,
    CAST((CAST(bd.n_ab AS HUGEINT) * tot.N * 100000000)
      // (CAST(sa.n AS HUGEINT) * sb.n) AS BIGINT) AS lift_e8
  FROM bd JOIN s sa ON bd.antecedent = sa.i
  JOIN s sb ON bd.consequent = sb.i CROSS JOIN tot)
SELECT * FROM r WHERE conf_e8 >= $minConfE8
ORDER BY antecedent, consequent""".stripMargin

  /** Distinct (basket, item) pairs of qualifying (≤ `maxBasket`) baskets
    * — the shared reduction under [[pairs]] and [[cosineNeighbors]].
    */
  private def qualifiedItems(df: DataFrame, basketCol: String,
                             itemCol: String, maxBasket: Int): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val bi = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sizes = bi.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBasket)
      .select(col("__b").as("__qb"))
    bi.join(sizes, col("__b") === col("__qb"), "left_semi")
  }

  /** Per-basket ordered pair occurrences over a qualified item table —
    * the ONE pairing definition every miner shares (r10 review fix:
    * this block was copy-pasted four times; a guard change landing in
    * one copy would silently fork n_ab semantics).
    */
  private def pairOccurrences(qualified: DataFrame): DataFrame =
    qualified.select(col("__b"), col("__i").as("__ia"))
      .join(qualified.select(col("__b").as("__b2"), col("__i").as("__ib")),
        col("__b") === col("__b2") && col("__ia") < col("__ib"))

  /** (\_\_ia, \_\_ib, `out`) pair counts at or above `minCount`. */
  private def pairCounts(qualified: DataFrame, minCount: Long,
                         out: String): DataFrame =
    pairOccurrences(qualified)
      .groupBy(col("__ia"), col("__ib"))
      .agg(count(lit(1)).as(out))
      .where(col(out) >= minCount)

  /** The excluded whales: (basket, n_items) over `maxBasket` — audit
    * before trusting a mined run (empty ⇒ the run was exhaustive).
    */
  def oversizedBaskets(df: DataFrame, basketCol: String, itemCol: String,
                       maxBasket: Int): DataFrame =
    df.where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("basket"), col(itemCol).as("__i"))
      .distinct()
      .groupBy(col("basket")).agg(count(lit(1)).as("n_items"))
      .where(col("n_items") > maxBasket)

  /** DuckDB replay of [[pairs]] — same distinct reduction, basket-size
    * gate, canonical pair order, and threshold.
    */
  def pairsOracle(table: String, basketCol: String, itemCol: String,
                  minCount: Long, maxBasket: Int = 1000): String =
    s"""WITH bi AS (SELECT DISTINCT $basketCol AS b, $itemCol AS i FROM $table
  WHERE $basketCol IS NOT NULL AND $itemCol IS NOT NULL),
q AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= $maxBasket)
SELECT a.i AS item_a, c.i AS item_b, CAST(count(*) AS BIGINT) AS n_baskets
FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
WHERE a.b IN (SELECT b FROM q)
GROUP BY 1, 2 HAVING count(*) >= $minCount
ORDER BY 1, 2""".stripMargin

  /** Frequent item TRIPLES by A-priori: candidate (a, b, c) occurrences
    * are generated ONLY through frequent (a, b) pair occurrences and
    * pruned against frequent (a, c) and (b, c) before counting — the
    * classical level-wise bound that keeps triple volume at
    * frequent-pair-occurrences × basket width instead of Σ C(|basket|, 3)
    * (downward closure: a frequent triple's every pair is frequent, so
    * the pruning is lossless — oracle-pinned by the naive 3-way join).
    * Same basket discipline as [[pairs]]: distinct (basket, item),
    * `maxBasket` whale exclusion (auditable via [[oversizedBaskets]]).
    */
  def triples(df: DataFrame, basketCol: String, itemCol: String,
              minCount: Long, maxBasket: Int = 1000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val qualified = qualifiedItems(df, basketCol, itemCol, maxBasket)
      .localCheckpoint(true)
    val fp = pairCounts(qualified, minCount, "__n")
      .select(col("__ia").as("__fa"), col("__ib").as("__fb"))
      .localCheckpoint(true)
    val pairOcc = pairOccurrences(qualified)
      .join(fp, col("__ia") === col("__fa") && col("__ib") === col("__fb"),
        "left_semi")
    val tri = pairOcc
      .join(qualified.select(col("__b").as("__b3"), col("__i").as("__ic")),
        col("__b") === col("__b3") && col("__ib") < col("__ic"))
      .join(fp.select(col("__fa").as("__xa"), col("__fb").as("__xc")),
        col("__ia") === col("__xa") && col("__ic") === col("__xc"),
        "left_semi")
      .join(fp.select(col("__fa").as("__ya"), col("__fb").as("__yc")),
        col("__ib") === col("__ya") && col("__ic") === col("__yc"),
        "left_semi")
    tri.groupBy(col("__ia").as("item_a"), col("__ib").as("item_b"),
        col("__ic").as("item_c"))
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minCount)
  }

  /** Naive 3-way oracle for [[triples]] — correctness does not depend
    * on the pruning (downward closure), so the oracle skips it.
    */
  def triplesOracle(table: String, basketCol: String, itemCol: String,
                    minCount: Long, maxBasket: Int = 1000): String =
    s"""WITH bi AS MATERIALIZED (
  SELECT DISTINCT $basketCol AS b, $itemCol AS i FROM $table
  WHERE $basketCol IS NOT NULL AND $itemCol IS NOT NULL),
q AS MATERIALIZED (SELECT b FROM bi GROUP BY b HAVING count(*) <= $maxBasket),
bq AS MATERIALIZED (SELECT bi.b, bi.i FROM bi JOIN q USING (b))
SELECT a.i AS item_a, c.i AS item_b, d.i AS item_c,
  CAST(count(*) AS BIGINT) AS n_baskets
FROM bq a JOIN bq c ON a.b = c.b AND a.i < c.i
JOIN bq d ON a.b = d.b AND c.i < d.i
GROUP BY 1, 2, 3 HAVING count(*) >= $minCount
ORDER BY 1, 2, 3""".stripMargin
}
