package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dunning log-likelihood keyness — WHICH terms distinguish a slice of
  * the corpus from the rest (the corpus-linguistics G² statistic, the
  * principled replacement for raw-frequency "top words"): TF-IDF asks
  * what characterizes a DOCUMENT; keyness asks what characterizes a
  * CLASS (a language, a source, a time slice), and unlike PMI it
  * doesn't explode on rare terms — G² = 2·Σ O·ln(O/E) over the 2×2
  * (term-in-slice, term-in-rest, other-in-slice, other-in-rest) table
  * weighs evidence by volume.
  *
  * Exactness ladder: the four observed/expected cells are exact
  * integers/rationals off ONE (term, class) token collapse; each of
  * the four O·ln(O/E) terms publishes through the single-double-chain
  * ⌊10⁶·2·O·ln(O·N/(R·C))⌋ convention (the [[graft.operators
  * .Contingency]] per-term-floor device; zero cells contribute exactly
  * 0 — the lim x→0 x·ln x law, declared), so `g2_q6` = the sum of four
  * floors hash-gates. The SIGN of enrichment rides beside
  * (`enriched` = observed in-slice share above the global share,
  * cross-multiplied exact) — G² alone is two-sided. `minCount` prunes
  * the long tail AFTER the exact arithmetic.
  *
  * Scale shape: one scan-stage tokenize+explode, one partial-agg'd
  * (term, in-slice) collapse, totals on a 1-row broadcast — the
  * corpus never scans twice.
  */
object Keyness {

  val Scale = 1000000L

  /** (term, n_slice, n_rest, g2_q6, enriched) for terms with
    * n_slice + n_rest ≥ minCount; `sliceCond` marks the slice rows.
    */
  def keyness(docs: DataFrame, textCol: String,
              sliceCond: org.apache.spark.sql.Column,
              minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val cells = docs
      .where(col(textCol).isNotNull && sliceCond.isNotNull)
      .select(sliceCond.as("__in"),
        explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .groupBy(col("__t"))
      .agg(sum(when(col("__in"), 1L).otherwise(0L)).as("n_slice"),
        sum(when(col("__in"), 0L).otherwise(1L)).as("n_rest"))
      .where(col("n_slice") + col("n_rest") >= minCount)
      .localCheckpoint(true)
    val totals = cells.agg(
      coalesce(sum(col("n_slice")), lit(0L)).as("__ts"),
      coalesce(sum(col("n_rest")), lit(0L)).as("__tr"))
    // 2x2 per term: a = in-slice, b = in-rest, c = other slice tokens,
    // d = other rest tokens; each O ln(O/E) a single double chain
    def term(o: org.apache.spark.sql.Column, rowTot: org.apache.spark.sql.Column,
             colTot: org.apache.spark.sql.Column,
             n: org.apache.spark.sql.Column) =
      when(o > 0L, floor(lit(2.0 * Scale) * o.cast("double") *
        log(o.cast("double") * n.cast("double") /
          (rowTot.cast("double") * colTot.cast("double"))))
        .cast("long")).otherwise(lit(0L))
    val withTotals = cells.crossJoin(broadcast(totals))
    val a = col("n_slice"); val b = col("n_rest")
    val ts = col("__ts"); val tr = col("__tr")
    val n = ts + tr
    val c = ts - a
    val d = tr - b
    val rowAb = a + b
    val rowCd = c + d
    val g2 = term(a, rowAb, ts, n) + term(b, rowAb, tr, n) +
      term(c, rowCd, ts, n) + term(d, rowCd, tr, n)
    withTotals.select(col("__t").as("term"), a.as("n_slice"),
      b.as("n_rest"), g2.as("g2_q6"),
      // enrichment sign: slice share above global share, cross-mult
      (a * n > rowAb * ts).as("enriched"))
  }

  /** DuckDB replay; `docsSql` yields (txt, in_slice). */
  def oracleSql(docsSql: String, minCount: Long = 5L): String = {
    def term(o: String, rowTot: String, colTot: String) =
      s"""CASE WHEN $o > 0 THEN CAST(floor(${2.0 * Scale} * CAST($o AS DOUBLE)
    * ln(CAST($o AS DOUBLE) * CAST(n AS DOUBLE)
      / (CAST($rowTot AS DOUBLE) * CAST($colTot AS DOUBLE)))) AS BIGINT)
  ELSE 0 END"""
    s"""WITH cells AS (
  SELECT t AS term,
    CAST(count(*) FILTER (WHERE in_slice) AS BIGINT) AS a,
    CAST(count(*) FILTER (WHERE NOT in_slice) AS BIGINT) AS b
  FROM (SELECT in_slice, unnest(string_split(txt, ' ')) AS t
    FROM ($docsSql) WHERE txt IS NOT NULL AND in_slice IS NOT NULL)
  GROUP BY t HAVING count(*) >= $minCount),
tot AS (SELECT coalesce(sum(a), 0) AS ts, coalesce(sum(b), 0) AS tr
  FROM cells),
x AS (SELECT term, a, b, ts, tr, ts + tr AS n,
    ts - a AS c, tr - b AS d FROM cells, tot)
SELECT term, a AS n_slice, b AS n_rest,
  ${term("a", "(a + b)", "ts")} + ${term("b", "(a + b)", "tr")}
    + ${term("c", "(c + d)", "ts")} + ${term("d", "(c + d)", "tr")}
    AS g2_q6,
  a * n > (a + b) * ts AS enriched
FROM x ORDER BY term"""
  }
}
