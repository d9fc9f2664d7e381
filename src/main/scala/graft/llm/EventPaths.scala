package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Common behavioral paths — the top event-type k-grams across per-user
  * streams ("view>cart>buy happens 40k times, view>cart>exit 90k"): the
  * product-analytics staple between L104's single-step transition matrix
  * (k = 2 adjacency only) and L50's PREDEFINED funnel (here paths are
  * DISCOVERED, not specified). Sequences ride the bounded
  * [[graft.functions.FirstK]] prefix (≤`maxEvents` per user — the
  * L66/L104 whale posture), paths are scan-stage k-gram surgery over the
  * per-user type array, and the result is the deterministic top-N by
  * (occurrences desc, path asc) via TakeOrderedAndProject — ≤N rows per
  * partition move, never a global sort.
  */
object EventPaths {

  /** `>`-joined k-grams over a type-array COLUMN (shifted zip; fewer than
    * `n` events means no paths).
    */
  def pathGrams(types: Column, n: Int): Column = {
    require(n >= 2, s"a path needs at least 2 steps, got $n")
    val joined = (1 until n).foldLeft(types) { (acc, j) =>
      zip_with(acc, slice(types, lit(j + 1), greatest(size(types) - j, lit(0))),
        (a, b) => concat(a, lit(">"), b))
    }
    array_compact(joined)
  }

  /** (path, n_occ, n_users): the `topN` most frequent `pathLen`-step
    * paths over the first `maxEvents` events per user (strict (ts, id)
    * order; unrankable rows drop — the actionSequences contract).
    */
  def topPaths(events: DataFrame, pathLen: Int, maxEvents: Int, topN: Int,
               userCol: String = "user_id", tsCol: String = "ts",
               typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    require(maxEvents > 0 && topN > 0, "maxEvents and topN must be positive")
    val t = unix_micros(col(tsCol).cast("timestamp"))
    val i = col(idCol).cast("long")
    events.where(t.isNotNull && i.isNotNull)
      .groupBy(col(userCol))
      .agg(graft.functions.FirstK(maxEvents)(t, i, col(typeCol)).as("__seq"))
      .select(col(userCol),
        transform(col("__seq"), s => s.getField("_3")).as("__types"))
      .select(col(userCol), pathGrams(col("__types"), pathLen).as("__paths"))
      .select(col(userCol), explode(col("__paths")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_occ"), count_distinct(col(userCol)).as("n_users"))
      .orderBy(col("n_occ").desc, col("path").asc)
      .limit(topN)
  }

  /** DuckDB replay of [[topPaths]] — same prefix cut, same k-gram
    * construction, same deterministic top-N.
    */
  def topPathsOracle(table: String, pathLen: Int, maxEvents: Int, topN: Int,
                     userCol: String = "user_id", tsCol: String = "ts",
                     typeCol: String = "event_type", idCol: String = "event_id"): String = {
    val terms = (1 to pathLen).map(j => s"tl[i+$j]").mkString(" || '>' || ")
    s"""WITH e AS (SELECT $userCol, $typeCol,
  row_number() OVER (PARTITION BY $userCol ORDER BY $tsCol, $idCol) AS rn
  FROM $table WHERE $tsCol IS NOT NULL AND $idCol IS NOT NULL),
seq AS (SELECT $userCol, list($typeCol ORDER BY rn) AS tl
  FROM e WHERE rn <= $maxEvents GROUP BY $userCol),
g AS (SELECT $userCol,
    unnest(list_transform(range(len(tl) - ${pathLen - 1}), i -> $terms)) AS path
  FROM seq)
-- a NULL event type nulls its grams: the Spark side drops them via
-- concat propagation + array_compact, so the oracle must too
SELECT path, CAST(count(*) AS BIGINT) AS n_occ,
  CAST(count(DISTINCT $userCol) AS BIGINT) AS n_users
FROM g WHERE path IS NOT NULL
GROUP BY 1 ORDER BY n_occ DESC, path ASC LIMIT $topN""".stripMargin
  }
}
