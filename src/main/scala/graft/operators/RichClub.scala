package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rich-club coefficient — do the hubs talk to EACH OTHER? φ(k) =
  * 2·E_k / (N_k·(N_k−1)) over the subgraph of nodes with degree > k:
  * the network-science readout that separates an elite core (high
  * φ at high k — financial networks, co-authorship) from hub-avoids-
  * hub infrastructure (low φ — routers); [[GraphMixing]]'s
  * assortativity is the one-number CORRELATION summary, this is the
  * per-threshold CURVE it summarizes.
  *
  * One-pass decomposition: an edge survives threshold k exactly when
  * its MIN endpoint degree exceeds k, so one degrees-join gives every
  * edge its min-degree and every declared threshold reads off two
  * conditional counts — no per-k subgraph materialization. φ publishes
  * as the exact fraction (n_edges, n_nodes) plus ONE truncating
  * phi_q6 division; clubs with fewer than 2 members publish NULL
  * (no possible edge — the degenerate club, spec-pinned). Edges
  * canonicalize (undirected, dedup, loop-free, the [[Triangles]]
  * convention); thresholds are declared literals.
  *
  * Scale shape: one partial-agg'd degree count, one broadcastable
  * degrees-join onto edges, ONE conditional-sum aggregate over all
  * thresholds — |ks| never multiplies the edge pass.
  */
object RichClub {

  val Scale = 1000000L

  /** (k, n_nodes, n_edges, phi_q6) for each declared threshold. */
  def coefficients(edges: DataFrame, srcCol: String, dstCol: String,
                   ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.distinct == ks,
      s"thresholds must be non-empty, sorted, distinct; got $ks")
    require(ks.forall(_ >= 0), s"thresholds must be non-negative: $ks")
    val e = Triangles.canonicalEdges(edges, srcCol, dstCol)
      .localCheckpoint(true)
    val deg = e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val em = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(least(col("du"), col("dv")).as("__m"))
    val eCols = ks.map(k => sum(when(col("__m") > k, 1L).otherwise(0L))
      .as(s"__e$k"))
    val edgeCounts = em.agg(eCols.head, eCols.tail: _*)
    val nCols = ks.map(k => sum(when(col("deg") > k, 1L).otherwise(0L))
      .as(s"__n$k"))
    val nodeCounts = deg.agg(nCols.head, nCols.tail: _*)
    val joined = edgeCounts.crossJoin(broadcast(nodeCounts))
    val rows = ks.map { k =>
      // coalesce: global aggregates over an EMPTY edge set yield NULL
      // sums, but the honest club size is 0 (r10 review fix)
      val n = coalesce(col(s"__n$k"), lit(0L))
      val ec = coalesce(col(s"__e$k"), lit(0L))
      struct(lit(k).as("k"), n.as("n_nodes"), ec.as("n_edges"),
        when(n >= 2L, call_function("div",
          lit(2L) * ec * lit(Scale), n * (n - 1L))).as("phi_q6"))
    }
    joined.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.k").as("k"), col("__r.n_nodes").as("n_nodes"),
        col("__r.n_edges").as("n_edges"), col("__r.phi_q6").as("phi_q6"))
  }

  /** DuckDB replay; `edgesSql` yields (src, dst). */
  def oracleSql(edgesSql: String, ks: Seq[Long]): String = {
    val kList = ks.mkString("[", ", ", "]")
    s"""WITH e AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM ($edgesSql) WHERE src IS NOT NULL AND dst IS NOT NULL
    AND src <> dst),
deg AS MATERIALIZED (
  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY id),
em AS (SELECT least(du.deg, dv.deg) AS m
  FROM e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
ks AS (SELECT unnest($kList) AS k)
SELECT k,
  (SELECT CAST(count(*) AS BIGINT) FROM deg WHERE deg > k) AS n_nodes,
  (SELECT CAST(count(*) AS BIGINT) FROM em WHERE m > k) AS n_edges,
  CASE WHEN (SELECT count(*) FROM deg WHERE deg > k) >= 2
       THEN CAST((2 * (SELECT count(*) FROM em WHERE m > k) * $Scale)
         // ((SELECT count(*) FROM deg WHERE deg > k)
           * ((SELECT count(*) FROM deg WHERE deg > k) - 1)) AS BIGINT)
  END AS phi_q6
FROM ks ORDER BY k"""
  }
}
