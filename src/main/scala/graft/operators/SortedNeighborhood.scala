package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood candidate generation (Hernández–Stolfo) — the
  * OTHER classic record-linkage blocking beside [[RecordLinkage]]'s
  * equi-blocking: sort every record by a composite key (normalized
  * name, address prefix, phone digits), and pair records within `w`
  * positions of each other. Where equi-blocking misses near-misses that
  * straddle a block boundary ("Jon"/"John" hash apart), the sorted
  * order puts them adjacent — the standard complement; production
  * linkage runs several passes with different keys and unions pairs.
  *
  * Scale shape: NO global sort — the rank is
  * [[graft.core.DenseIndex]]'s range-exchange + per-partition dense
  * index (the L113 machinery); neighborhood pairing is an equi-join on
  * the rank BLOCK (`rank div w`, each left row exploded to its own and
  * its successor block — every pair within distance w shares one of
  * those two block keys, pairs further apart never join) with the exact
  * `0 < rank_b − rank_a ≤ w` filter on the residual. Candidate volume
  * is O(n·w) by construction — the designer's knob, never quadratic.
  */
object SortedNeighborhood {

  /** (id_a, id_b, rank_a, rank_b) for every pair within `w` positions in
    * the (sortCol, idCol) total order; id_a is the earlier-ranked row.
    * Rows with NULL sort key or id drop (unrankable).
    */
  def candidates(df: DataFrame, idCol: String, sortCol: String,
                 w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val sorted = df
      .where(col(idCol).isNotNull && col(sortCol).isNotNull)
      .select(col(idCol), col(sortCol))
      .repartitionByRange(col(sortCol), col(idCol))
      .sortWithinPartitions(sortCol, idCol)
    // pinned: range-exchange layouts are not replay-deterministic (see
    // DenseIndex.withDenseIndexPinned)
    val ranked = graft.core.DenseIndex.withDenseIndexPinned(sorted, "__rank")
      .localCheckpoint(true)
    // a pair (a, b) with 0 < rank_b − rank_a ≤ w has rank_b in block
    // rank_a div w or the next one — index the left side under both
    val lhs = ranked.select(col(idCol).as("id_a"), col("__rank").as("rank_a"),
        explode(array(expr(s"__rank div $w"), expr(s"__rank div $w + 1"))).as("__blk"))
    val rhs = ranked.select(col(idCol).as("id_b"), col("__rank").as("rank_b"),
        expr(s"__rank div $w").as("__rblk"))
    lhs.join(rhs, col("__blk") === col("__rblk") &&
        col("rank_b") > col("rank_a") && col("rank_b") - col("rank_a") <= w)
      .select(col("id_a"), col("id_b"), col("rank_a"), col("rank_b"))
  }

  /** DuckDB replay of [[candidates]] — the naive rank-window self-join
    * over the same (sortCol, idCol) total order.
    */
  def candidatesOracle(table: String, idCol: String, sortSql: String,
                       w: Int): String =
    s"""WITH r AS (SELECT $idCol,
  row_number() OVER (ORDER BY $sortSql, $idCol) - 1 AS rk
  FROM $table WHERE $idCol IS NOT NULL AND ($sortSql) IS NOT NULL)
SELECT a.$idCol AS id_a, b.$idCol AS id_b,
  CAST(a.rk AS BIGINT) AS rank_a, CAST(b.rk AS BIGINT) AS rank_b
FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= $w
ORDER BY 1, 2""".stripMargin
}
