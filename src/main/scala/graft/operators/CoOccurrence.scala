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
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val bi = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sizes = bi.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBasket)
      .select(col("__b").as("__qb"))
    val qualified = bi.join(sizes, col("__b") === col("__qb"), "left_semi")
    qualified.select(col("__b"), col("__i").as("__ia"))
      .join(qualified.select(col("__b").as("__b2"), col("__i").as("__ib")),
        col("__b") === col("__b2") && col("__ia") < col("__ib"))
      .groupBy(col("__ia").as("item_a"), col("__ib").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minCount)
  }

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
}
