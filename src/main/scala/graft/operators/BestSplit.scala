package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-stump learning — the best single threshold split of a
  * numeric feature against a binary label by Gini impurity: the
  * feature-quality primitive behind tree induction, univariate feature
  * ranking ("which metric best separates churners"), and cutoff
  * selection for triage rules. For split x ≤ t the weighted Gini is
  *   G(t) = [nL² − posL² − negL²]/nL + [nR² − posR² − negR²]/nR
  * (unnormalized by n, which is constant across candidates); the best
  * t minimizes it. Everything is exact integer arithmetic off ONE
  * sorted cumulative pass: rows collapse to distinct feature-value
  * cells (partial-agg'd), cumulative (n, pos) windows give every
  * candidate's left counts, and G(t) publishes as the single declared
  * truncating division gini_q6 = ⌊10⁶·(A·nR + B·nL)/(nL·nR)⌋ in
  * DECIMAL(38,0) — ties break on the smaller threshold (declared), so
  * the argmin is one struct-min both engines replay bit-for-bit.
  *
  * Contracts: the label must be STRICTLY 0/1 — anything else raises
  * in-plan (a silently-coerced label is a corrupted model); the
  * feature axis is the bounded-cardinality kind (distinct values per
  * group — bucket continuous features first, the KendallTau/L143
  * discipline); single-valued groups publish NULL threshold (no valid
  * split); NULL feature/label rows drop; NULL groups are real strata.
  */
object BestSplit {

  val Scale = 1000000L

  /** One row per group: (groupCol, n_rows, n_pos, parent_gini_q6,
    * threshold, n_left, pos_left, split_gini_q6). NULL split columns
    * when no candidate exists (a single distinct feature value).
    */
  def giniStump(df: DataFrame, groupCol: String, featureCol: String,
                labelCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, featureCol, "giniStump")
    graft.Guards.requireIntegral(df, labelCol, "giniStump")
    val dec = "decimal(38,0)"
    val rows = df
      .where(col(featureCol).isNotNull && col(labelCol).isNotNull)
      .select(col(groupCol), col(featureCol).cast("long").as("__x"),
        when(col(labelCol).cast("long").isin(0L, 1L),
          col(labelCol).cast("long"))
          .otherwise(raise_error(concat(
            lit("giniStump: label must be 0/1, got "),
            col(labelCol).cast("string")))).as("__y"))
    val cells = rows.groupBy(col(groupCol), col("__x"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"))
    val order = Window.partitionBy(col(groupCol)).orderBy(col("__x"))
    val full = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = cells
      .withColumn("__nl", sum(col("__c")).over(order).cast(dec))
      .withColumn("__pl", sum(col("__p")).over(order).cast(dec))
      .withColumn("__n", sum(col("__c")).over(full).cast(dec))
      .withColumn("__pos", sum(col("__p")).over(full).cast(dec))
    def giniNum(n: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
      n * n - p * p - (n - p) * (n - p)
    val nr = col("__n") - col("__nl")
    val pr = col("__pos") - col("__pl")
    // candidates: every cell except the last (right side must be non-empty)
    val cand = cum.where(nr > 0)
      .withColumn("__gq", call_function("div",
        (giniNum(col("__nl"), col("__pl")) * nr +
          giniNum(nr, pr) * col("__nl")) * lit(Scale).cast(dec),
        (col("__nl") * nr).cast(dec)))
      .groupBy(col(groupCol).as("__cg"))
      .agg(min(struct(col("__gq"), col("__x"), col("__nl"), col("__pl")))
        .as("__best"))
    val parent = cells.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("__n"), sum(col("__p")).as("__pos"))
      .withColumn("__pgq", call_function("div",
        giniNum(col("__n").cast(dec), col("__pos").cast(dec)) *
          lit(Scale).cast(dec),
        col("__n").cast(dec)))
    parent.join(cand, col(groupCol) <=> col("__cg"), "left")
      .select(col(groupCol),
        col("__n").cast("long").as("n_rows"),
        col("__pos").cast("long").as("n_pos"),
        col("__pgq").as("parent_gini_q6"),
        col("__best.__x").as("threshold"),
        col("__best.__nl").cast("long").as("n_left"),
        col("__best.__pl").cast("long").as("pos_left"),
        col("__best.__gq").as("split_gini_q6"))
  }

  /** DuckDB replay — same cells, same cumulative windows, same single
    * truncating division, same (gini, threshold) tie rule via QUALIFY.
    * `rowsSql` yields (grp, x, y) with y already validated 0/1.
    */
  def oracleSql(rowsSql: String, groupName: String): String =
    s"""WITH cells AS (
  SELECT grp, x, CAST(count(*) AS HUGEINT) AS c, CAST(sum(y) AS HUGEINT) AS p
  FROM ($rowsSql) WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY grp, x),
cum AS (SELECT grp, x,
    sum(c) OVER w AS nl, sum(p) OVER w AS pl,
    sum(c) OVER u AS n, sum(p) OVER u AS pos
  FROM cells
  WINDOW w AS (PARTITION BY grp ORDER BY x),
    u AS (PARTITION BY grp ROWS BETWEEN UNBOUNDED PRECEDING
      AND UNBOUNDED FOLLOWING)),
cand AS (SELECT grp, x, nl, pl,
    ((nl*nl - pl*pl - (nl-pl)*(nl-pl)) * (n-nl)
      + ((n-nl)*(n-nl) - (pos-pl)*(pos-pl) - ((n-nl)-(pos-pl))*((n-nl)-(pos-pl))) * nl)
      * $Scale // (nl * (n-nl)) AS gq
  FROM cum WHERE n - nl > 0
  QUALIFY row_number() OVER (PARTITION BY grp ORDER BY gq, x) = 1),
parent AS (SELECT grp, n, pos,
    (n*n - pos*pos - (n-pos)*(n-pos)) * $Scale // n AS pgq
  FROM (SELECT grp, CAST(sum(c) AS HUGEINT) AS n,
      CAST(sum(p) AS HUGEINT) AS pos FROM cells GROUP BY grp))
SELECT parent.grp AS $groupName,
  CAST(parent.n AS BIGINT) AS n_rows, CAST(parent.pos AS BIGINT) AS n_pos,
  CAST(parent.pgq AS BIGINT) AS parent_gini_q6,
  cand.x AS threshold, CAST(cand.nl AS BIGINT) AS n_left,
  CAST(cand.pl AS BIGINT) AS pos_left, CAST(cand.gq AS BIGINT) AS split_gini_q6
FROM parent LEFT JOIN cand ON cand.grp IS NOT DISTINCT FROM parent.grp
ORDER BY parent.grp"""
}
