package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction — which NON-edges look like edges:
  * for every unconnected pair with ≥ minCommon shared neighbors, the
  * common-neighbor count and the Adamic–Adar score Σ_w 1/ln(deg w) —
  * rare shared neighbors say more than hubs ("both follow a 50-follower
  * account" beats "both follow the celebrity"). The recommendation /
  * record-linkage-candidate reading of the graph family: [[Triangles]]
  * closes wedges that ARE closed, this ranks the open ones.
  *
  * The AA term quantizes per center — ⌊10⁶/ln(deg w)⌋, one double
  * chain per degree value (the per-term quantized-ln discipline), then
  * exact integer sums; deg comes from the FULL canonical graph even
  * when the center is wedge-cut.
  *
  * Scale shape: wedge volume is Σ_w deg(w)²/2 — a 10⁶-degree hub is a
  * 10¹²-wedge bomb, so wedge CENTERS are cut at maxDeg (declared
  * semantics the oracle replays, not an approximation: the published
  * score is "AA over centers of degree ≤ maxDeg", and hub centers are
  * exactly the terms AA itself down-weights hardest; size the cut with
  * [[NeighborStats.degreeStats]]). After the cut the wedge join is
  * self-equi on the center key with per-key fan-out ≤ maxDeg²/2;
  * scores partial-agg on (s, t); the existing-edge anti-join is
  * 16-byte-keyed. Self-loops and duplicate edges canonicalize away.
  */
object LinkPredict {

  val Scale = 1000000L

  /** (src, dst, cn, aa_q6) over non-edge pairs, src < dst. */
  def adamicAdar(edges: DataFrame, srcCol: String = "src",
                 dstCol: String = "dst", maxDeg: Long = 1000L,
                 minCommon: Long = 1L): DataFrame = {
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val ce = Triangles.canonicalEdges(edges, srcCol, dstCol)
      .localCheckpoint(true)
    val adj = ce.select(col("u").as("__w"), col("v").as("__n"))
      .union(ce.select(col("v").as("__w"), col("u").as("__n")))
    val deg = adj.groupBy(col("__w")).agg(count(lit(1)).as("__d"))
    val cen = adj.join(deg, Seq("__w"))
      .where(col("__d") >= 2L && col("__d") <= maxDeg)
      .withColumn("__t",
        floor(lit(Scale.toDouble) / log(col("__d").cast("double")))
          .cast("long"))
    val wedges = cen.as("a").join(cen.as("b"),
        col("a.__w") === col("b.__w") && col("a.__n") < col("b.__n"))
      .select(col("a.__n").as("src"), col("b.__n").as("dst"),
        col("a.__t").as("__t"))
    wedges.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("cn"), sum(col("__t")).as("aa_q6"))
      .where(col("cn") >= minCommon)
      .join(ce.select(col("u").as("src"), col("v").as("dst")),
        Seq("src", "dst"), "left_anti")
  }

  /** DuckDB replay of [[adamicAdar]] — same canonicalization, degree
    * cut, per-term floor and anti-join.
    */
  def oracleSql(edgesSql: String, maxDeg: Long, minCommon: Long): String =
    s"""WITH e0 AS ($edgesSql),
ce AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM e0 WHERE src <> dst),
adj AS (SELECT u AS w, v AS n FROM ce UNION ALL SELECT v, u FROM ce),
deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
cen AS (SELECT adj.w, adj.n,
    CAST(floor(${Scale}.0 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS t
  FROM adj JOIN deg USING (w) WHERE d >= 2 AND d <= $maxDeg),
wg AS (SELECT a.n AS src, b.n AS dst, a.t
  FROM cen a JOIN cen b ON a.w = b.w AND a.n < b.n),
sc AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS cn,
    CAST(sum(t) AS BIGINT) AS aa_q6
  FROM wg GROUP BY 1, 2 HAVING count(*) >= $minCommon)
SELECT sc.* FROM sc LEFT JOIN ce ON sc.src = ce.u AND sc.dst = ce.v
WHERE ce.u IS NULL ORDER BY src, dst"""
}
