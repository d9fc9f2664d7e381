package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an undirected graph — the standard local
  * clustering / cohesion primitive (spam-farm detection in link graphs,
  * community density scoring before corpus sampling), computed with the
  * degree-orientation join (Suri & Vassilvitskii, WWW'11 "Counting
  * triangles and the curse of the last reducer").
  *
  * Scale shape (100 TB edge list): the naive wedge join fans out
  * quadratically on hub vertices (a 10⁸-degree whale generates 10¹⁶
  * wedges). Orienting every edge along the total order
  * π = (degree, id) — from the lower-π endpoint to the higher — caps
  * every vertex's OUT-degree at O(√m) (a vertex keeps only neighbors of
  * larger degree, and only √m vertices can have degree > √m), so the
  * wedge join is Σ outdeg² ≤ O(m^{3/2}) — the optimal bound — instead of
  * Σ deg². Each triangle then has exactly ONE π-minimal vertex, so it is
  * generated exactly once as a wedge at that vertex and closed by one
  * equi-join probe against the oriented edge list; there is no
  * post-dedup, no division by 3/6, and every step is an integer
  * equi-join or aggregation — bit-identical on any engine/partitioning.
  *
  * Reference scope note: fabrix has no graph operators — this extends the
  * graph family ([[GraphRank]] PageRank, [[graft.llm.DedupClusters]]
  * connected components).
  */
object Triangles {

  /** Canonical undirected edge set from a possibly-dirty edge list:
    * self-loops dropped, each edge kept once as (u < v).
    */
  def canonicalEdges(edges: DataFrame, srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** One row per triangle, (a, b, c) with π(a) < π(b) < π(c) where
    * π = (degree, id) — so `a` is each triangle's π-minimal vertex and no
    * triangle repeats. Input edges are canonicalized first.
    */
  def triangles(edges: DataFrame, srcCol: String = "src",
                dstCol: String = "dst"): DataFrame =
    trianglesFromCanonical(canonicalEdges(edges, srcCol, dstCol).localCheckpoint(false))

  /** [[triangles]] over an ALREADY canonical (u < v, distinct, loop-free)
    * edge set — skips the canonicalization shuffle for callers that hold
    * one (checkpoint it first if it will be consumed more than once).
    */
  private def trianglesFromCanonical(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient u—v from the π-smaller endpoint; carry BOTH endpoints' π so
    // the wedge stage can order its two far ends without another join
    val piU = struct(col("du").as("d"), col("u").as("i"))
    val piV = struct(col("dv").as("d"), col("v").as("i"))
    val oriented = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(piU < piV, col("u")).otherwise(col("v")).as("src"),
        when(piU < piV, col("v")).otherwise(col("u")).as("dst"),
        when(piU < piV, piV).otherwise(piU).as("pDst"))
      .localCheckpoint(false)
    // wedges at the π-min vertex: two out-edges of the same source, far
    // ends ordered by π — then one equi-probe for the closing edge, which
    // (if present) is oriented b→c because π(b) < π(c)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.pDst") < col("e2.pDst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    wedges.join(oriented.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"))
      .select("a", "b", "c")
  }

  /** Per-vertex triangle participation over EVERY vertex of the graph
    * (vertices in no triangle report 0): (id, n_triangles).
    */
  def perVertex(edges: DataFrame, srcCol: String = "src",
                dstCol: String = "dst"): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint(false)
    val tri = trianglesFromCanonical(e)
    val counts = tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    e.select(col("u").as("id")).union(e.select(col("v").as("id"))).distinct()
      .join(counts, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Local clustering coefficient — how much of each vertex's
    * neighborhood is itself connected: `cc = 2T / (d(d−1))` with T the
    * vertex's triangle count and d its degree, published exactly as
    * `cc_e8 = ⌊10⁸·2T / (d(d−1))⌋` (non-negative, so truncating div is
    * floor on both engines). The per-vertex echo-chamber / bot-ring
    * signal on top of [[perVertex]]: a high-degree vertex whose
    * neighbors never interlink (a spam hub) scores 0 however many
    * triangles the graph has. Degree-1 and isolated-in-canonical-form
    * vertices have an undefined coefficient and report NULL (not 0 —
    * "no neighborhood to close" is not "an open neighborhood").
    * Same scale shape as [[perVertex]] plus one degree aggregate.
    */
  def clusteringCoefficient(edges: DataFrame, srcCol: String = "src",
                            dstCol: String = "dst"): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint(true)
    val tri = trianglesFromCanonical(e)
    val counts = tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("__t"))
    val deg = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    deg
      .join(counts, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("__t"), lit(0L)).as("n_triangles"))
      .withColumn("cc_e8",
        when(col("degree") < 2, lit(null).cast("long"))
          .otherwise(expr("CAST((n_triangles * CAST(200000000 AS " +
            "DECIMAL(38,0))) div (degree * (degree - 1)) AS BIGINT)")))
  }

  /** DuckDB replay of [[clusteringCoefficient]]. */
  def clusteringOracle(edgesSql: String): String =
    s"""WITH raw AS ($edgesSql),
e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM raw WHERE src <> dst),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
corners AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree FROM
  (SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY id),
t AS (SELECT d.id, d.degree, CAST(count(c.id) AS BIGINT) AS n_triangles
  FROM deg d LEFT JOIN corners c ON d.id = c.id GROUP BY d.id, d.degree)
SELECT id, degree, n_triangles,
  CASE WHEN degree < 2 THEN NULL
    ELSE CAST((CAST(n_triangles AS HUGEINT) * 200000000)
      // (CAST(degree AS HUGEINT) * (degree - 1)) AS BIGINT) END AS cc_e8
FROM t ORDER BY id""".stripMargin

  /** Co-occurrence (bipartite-projection) edge builder with a bounded
    * fan-out: pairs of items sharing a group key, where each group
    * contributes pairs only among its `maxPerGroup` SMALLEST distinct
    * items ([[graft.functions.BottomK]] — deterministic, bounded-buffer).
    * The unbounded projection fans out quadratically on a whale group (a
    * bot "order" with 10⁴ items = 5·10⁷ pairs from one key); the cut is
    * the visible-truncation discipline: group size can be audited
    * upstream, and k² bounds every group's contribution.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        maxPerGroup: Int): DataFrame = {
    require(maxPerGroup >= 2, s"maxPerGroup must be >= 2, got $maxPerGroup")
    df.select(col(groupCol).as("__g"), col(itemCol).cast("long").as("__i"))
      .where(col("__i").isNotNull)
      .distinct()
      .groupBy("__g")
      .agg(graft.functions.BottomK(maxPerGroup)(col("__i")).as("__items"))
      .select(explode(expr(
        """flatten(transform(__items, (x, i) ->
          |  transform(slice(__items, i + 2, size(__items) - i - 1),
          |    y -> struct(x AS src, y AS dst))))""".stripMargin)).as("e"))
      .select(col("e.src"), col("e.dst"))
  }

  /** DuckDB replay of [[perVertex]] over the same canonical edges: the
    * textbook three-way ordered join a<b<c (id order suffices for
    * counting — orientation only matters for the distributed bound), then
    * each triangle credited to all three corners.
    */
  def perVertexOracle(edgesSql: String): String =
    s"""WITH raw AS ($edgesSql),
e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM raw WHERE src <> dst),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
corners AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
nodes AS (SELECT u AS id FROM e UNION SELECT v FROM e)
SELECT n.id, count(c.id) AS n_triangles
FROM nodes n LEFT JOIN corners c ON n.id = c.id
GROUP BY n.id"""
}
