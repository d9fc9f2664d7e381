package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling — the graph family's density screen beside
  * [[Triangles]] (local clustering) and [[GraphRank]] (global
  * influence): iteratively remove vertices of degree < k; what survives
  * is the k-core, the standard coherent-community / bot-ring /
  * spam-farm signal (a vertex with many low-engagement neighbors
  * drops out even when its raw degree is high).
  *
  * This is the BOUNDED-ROUNDS peel: `rounds` synchronized removal
  * sweeps. Each sweep removes every currently-under-k vertex at once,
  * so the result after R rounds is a SUPERSET of the true k-core that
  * shrinks monotonically and reaches the fixpoint once no removal
  * occurs — the [[GraphRank]] fixed-iteration discipline (a data-
  * independent plan; convergence is checked by comparing against one
  * more round, not by a driver-side loop-until-empty). Real graphs
  * converge in a few sweeps; KCoreSpec pins a path graph, the
  * worst-case chain.
  *
  * Scale shape: per round, ONE partial-agg'd degree count and two
  * semi-joins against the surviving-vertex set — all equi-joins on
  * 8-byte ids, no windows; each round's edge set is eagerly
  * checkpointed (lineage would otherwise double per round — the
  * PageRank posture).
  *
  * Contracts: edges are undirected — input rows are symmetrized and
  * deduplicated; self-loops and NULL endpoints drop; `degree` in the
  * output is the degree WITHIN the surviving subgraph (that is the
  * k-core definition; survivors can show degree < k only when
  * `rounds` stopped short of the fixpoint).
  */
object KCore {

  /** (vertex, degree) after `rounds` peel sweeps at threshold `k`. */
  def peel(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
           rounds: Int): DataFrame = {
    require(k >= 1, s"k must be at least 1, got $k")
    require(rounds >= 1 && rounds <= 50,
      s"rounds must be in [1, 50], got $rounds")
    val base = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
    var e = base
      .unionAll(base.select(col("__d").as("__s"), col("__s").as("__d")))
      .distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
        .where(col("__n") >= k)
        .select(col("__s").as("__v"))
        .localCheckpoint(true)
      e = e
        .join(keep, col("__s") === col("__v"), "left_semi")
        .join(keep, col("__d") === col("__v"), "left_semi")
        .localCheckpoint(true)
    }
    e.groupBy(col("__s").as("vertex")).agg(count(lit(1)).as("degree"))
  }

  /** DuckDB replay of [[peel]] — the rounds unrolled as chained CTEs
    * (the BPE-replay discipline: bounded iteration becomes a bounded
    * expression).
    */
  def oracleSql(edgesSql: String, k: Int, rounds: Int): String = {
    val base =
      s"""e0 AS (
  SELECT DISTINCT s, d FROM (
    SELECT src AS s, dst AS d FROM ($edgesSql)
    WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
    UNION ALL
    SELECT dst AS s, src AS d FROM ($edgesSql)
    WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst))"""
    val steps = (1 to rounds).map { i =>
      s"""v$i AS (SELECT s FROM e${i - 1} GROUP BY s HAVING count(*) >= $k),
e$i AS (SELECT s, d FROM e${i - 1}
  WHERE s IN (SELECT s FROM v$i) AND d IN (SELECT s FROM v$i))"""
    }
    s"""WITH $base,
${steps.mkString(",\n")}
SELECT s AS vertex, CAST(count(*) AS BIGINT) AS degree
FROM e$rounds GROUP BY s ORDER BY vertex""".stripMargin
  }
}
