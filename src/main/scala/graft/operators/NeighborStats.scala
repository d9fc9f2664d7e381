package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-vertex neighbor-degree features — the first-order structural
  * features a graph ML pipeline materializes before any model sees the
  * graph ("is this account connected to hubs or to leaves?"): for each
  * vertex, its degree plus the min / max / exact-mean degree of its
  * neighbors. High own-degree with low neighbor degrees is the classic
  * spam-hub shape; the mean is the per-vertex form of degree
  * assortativity. `nbr_avg_micro = ⌊10⁶·Σ nbr_deg / deg⌋` — exact,
  * non-negative, truncating div IS floor on both engines.
  *
  * Scale shape: one partial-agg'd degree count, one equi-join of the
  * (symmetrized) edge list against the degree table on the NEIGHBOR id,
  * one partial-agg'd min/max/sum per vertex — all 8-byte id shuffles; a
  * whale hub's neighbor list collapses in the map-side partials.
  * Undirected ([[GraphEdges]] canonicalization; self-loops and NULLs
  * drop).
  */
object NeighborStats {

  /** (vertex, degree, nbr_min_deg, nbr_max_deg, nbr_avg_micro). */
  def degreeStats(edges: DataFrame, srcCol: String,
                  dstCol: String): DataFrame = {
    val e = GraphEdges.symmetrize(edges, srcCol, dstCol)
    val deg = e.groupBy(col("__s").as("__v")).agg(count(lit(1)).as("__d"))
    e.join(deg.select(col("__v").as("__d2"), col("__d").as("__nd")),
        col("__d") === col("__d2"))
      .groupBy(col("__s").as("vertex"))
      .agg(count(lit(1)).as("degree"),
        min(col("__nd")).as("nbr_min_deg"),
        max(col("__nd")).as("nbr_max_deg"),
        sum(col("__nd").cast("decimal(38,0)")).as("__sum"))
      .select(col("vertex"), col("degree"), col("nbr_min_deg"),
        col("nbr_max_deg"),
        expr("CAST((__sum * 1000000) div degree AS BIGINT)")
          .as("nbr_avg_micro"))
  }

  /** DuckDB replay of [[degreeStats]]. */
  def oracleSql(edgesSql: String): String =
    s"""WITH ${GraphEdges.symmetrizeCteSql("e", edgesSql)},
deg AS (SELECT s AS v, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY s)
SELECT e.s AS vertex, CAST(count(*) AS BIGINT) AS degree,
  min(nd.d) AS nbr_min_deg, max(nd.d) AS nbr_max_deg,
  CAST((CAST(sum(nd.d) AS HUGEINT) * 1000000) // CAST(count(*) AS HUGEINT)
    AS BIGINT) AS nbr_avg_micro
FROM e JOIN deg nd ON e.d = nd.v
GROUP BY e.s ORDER BY vertex""".stripMargin
}
