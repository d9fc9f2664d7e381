package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked spatial radius join — all pairs of points within
  * Euclidean distance `r`, found without a cartesian product. The
  * geo-blocking member of the similarity-join family (LSH buckets text,
  * IVF lists embeddings, sorted-neighborhood blocks linkage — a uniform
  * grid blocks COORDINATES): store/POI proximity, sensor co-location,
  * pickup–dropoff matching.
  *
  * Coordinates are PLANAR INTEGERS (e.g. projected meters, or
  * microdegrees at city scale where the equirectangular approximation
  * holds — the caller owns the projection; no float trig enters the
  * plan). A pair matches iff `dx² + dy² ≤ r²`, exact in BIGINT.
  *
  * Shape: cell side = `r`, so matching points are never more than one
  * cell apart on either axis. The LEFT stream keys each point by its own
  * cell; the RIGHT stream replicates each point to its 3×3 neighbor
  * cells (a constant ×9, the hopping-window posture); one equi-join on
  * the cell id then the exact integer distance filter. Each candidate
  * pair meets EXACTLY once (the offset mapping right's cell onto left's
  * is unique), so no distinct pass is needed. Cell ids floor-divide via
  * `(x − pmod(x, r)) div r` — exact BIGINT for negative coordinates and
  * for |x| beyond 2^53 too, and DuckDB's integer `//` floors identically.
  *
  * Scale shape: blocking is a plain equi-join on `(cx, cy)` — shuffled
  * by cell, broadcast when one side is small, AQE-planned. A degenerate
  * hot cell (all points in one place) inherits the documented equi-join
  * salting posture [[SkewJoin]]; the ×9 replication is a constant, not a
  * data-dependent blowup. Candidate count is the true near-pair count
  * plus a bounded constant-factor slop (points in adjacent cells farther
  * than `r`), never O(n²) unless the DATA is O(n²) close.
  *
  * Contracts: NULL coordinates drop (a point without a position matches
  * nothing); `r ≥ 1`; self-pairs excluded and each unordered pair
  * reported once as `id_a < id_b`; `dist2 = dx² + dy²` rides along for
  * ranking without any square root.
  */
object SpatialJoin {

  // floor division via (c − pmod(c, r)) div r — the numerator is exactly
  // divisible, and IntegralDivide keeps the arithmetic in BIGINT
  // end-to-end (Spark's `/` on longs is DOUBLE division: beyond ~2^53 the
  // quotient can land in the wrong cell and silently miss near pairs)
  private def cell(c: org.apache.spark.sql.Column, r: Long) =
    call_function("div", c - pmod(c, lit(r)), lit(r))

  /** Self-join: (id_a, id_b, dist2) for every unordered pair of rows
    * within Euclidean distance `r` (id_a < id_b). `idCol` must be
    * integral and non-null per row (pairs are id-ordered).
    */
  def radiusPairs(df: DataFrame, idCol: String, xCol: String, yCol: String,
                  r: Long): DataFrame = {
    require(r >= 1, s"radius must be at least 1, got $r")
    val integral = Set("integer", "bigint", "smallint", "tinyint")
    val idType = df.schema(idCol).dataType.simpleString
    require(integral(idType),
      s"idCol '$idCol' must be integral for ordered pair output, got $idType")
    val pts = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val left = pts.select(col("__id").as("id_a"), col("__x").as("__xa"),
      col("__y").as("__ya"),
      cell(col("__x"), r).cast("long").as("__cx"),
      cell(col("__y"), r).cast("long").as("__cy"))
    // right replicated to its 3×3 neighborhood: the join cell is the
    // neighbor cell the point is visible FROM
    val offs = Seq(-1L, 0L, 1L)
    val right = pts
      .withColumn("__ox", explode(array(offs.map(lit): _*)))
      .withColumn("__oy", explode(array(offs.map(lit): _*)))
      .select(col("__id").as("id_b"), col("__x").as("__xb"),
        col("__y").as("__yb"),
        (cell(col("__x"), r).cast("long") + col("__ox")).as("__cx"),
        (cell(col("__y"), r).cast("long") + col("__oy")).as("__cy"))
    val dx = col("__xa") - col("__xb")
    val dy = col("__ya") - col("__yb")
    left.join(right, Seq("__cx", "__cy"))
      .where(col("id_a") < col("id_b") &&
        dx * dx + dy * dy <= lit(r) * lit(r))
      .select(col("id_a"), col("id_b"), (dx * dx + dy * dy).as("dist2"))
  }

  /** Bounded nearest neighbor: for each point, the closest OTHER point
    * within distance `r` — (id, nn_id, dist2), ties on distance broken
    * by the lowest neighbor id (deterministic). Points with no neighbor
    * inside `r` are ABSENT: the radius bounds the search by design (the
    * blocking guarantee needs it); an unbounded all-NN is a rerun at a
    * larger radius, not a silent full scan.
    *
    * Same grid shape as [[radiusPairs]] (un-ordered candidates this
    * time, self excluded); the election is one partial-agg'd
    * `min(struct(dist2, nn_id))` per point — a dense cell collapses
    * map-side.
    */
  def nearestNeighbor(df: DataFrame, idCol: String, xCol: String,
                      yCol: String, r: Long): DataFrame = {
    require(r >= 1, s"radius must be at least 1, got $r")
    val integral = Set("integer", "bigint", "smallint", "tinyint")
    val idType = df.schema(idCol).dataType.simpleString
    require(integral(idType),
      s"idCol '$idCol' must be integral for deterministic ties, got $idType")
    val pts = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val left = pts.select(col("__id").as("id"), col("__x").as("__xa"),
      col("__y").as("__ya"),
      cell(col("__x"), r).cast("long").as("__cx"),
      cell(col("__y"), r).cast("long").as("__cy"))
    val offs = Seq(-1L, 0L, 1L)
    val right = pts
      .withColumn("__ox", explode(array(offs.map(lit): _*)))
      .withColumn("__oy", explode(array(offs.map(lit): _*)))
      .select(col("__id").as("__nb"), col("__x").as("__xb"),
        col("__y").as("__yb"),
        (cell(col("__x"), r).cast("long") + col("__ox")).as("__cx"),
        (cell(col("__y"), r).cast("long") + col("__oy")).as("__cy"))
    val dx = col("__xa") - col("__xb")
    val dy = col("__ya") - col("__yb")
    left.join(right, Seq("__cx", "__cy"))
      .where(col("id") =!= col("__nb") &&
        dx * dx + dy * dy <= lit(r) * lit(r))
      .select(col("id"), (dx * dx + dy * dy).as("__d2"), col("__nb"))
      .groupBy(col("id"))
      .agg(min(struct(col("__d2"), col("__nb"))).as("__best"))
      .select(col("id"), col("__best.__nb").as("nn_id"),
        col("__best.__d2").as("dist2"))
  }

  /** DuckDB replay of [[nearestNeighbor]] — brute-force rank-1 election
    * with the same tie rule; hash equality proves the bounded-radius
    * blocking finds the true nearest.
    */
  def nearestOracleSql(table: String, idCol: String, xCol: String,
                       yCol: String, r: Long): String =
    s"""WITH p AS (
  SELECT CAST($idCol AS BIGINT) AS id, CAST($xCol AS BIGINT) AS x,
    CAST($yCol AS BIGINT) AS y
  FROM $table
  WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL AND $idCol IS NOT NULL),
c AS (
  SELECT a.id, b.id AS nn_id,
    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM p a JOIN p b ON a.id <> b.id
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= ${r * r})
SELECT id, nn_id, CAST(d2 AS BIGINT) AS dist2 FROM (
  SELECT id, nn_id, d2,
    row_number() OVER (PARTITION BY id ORDER BY d2, nn_id) AS rn
  FROM c) WHERE rn = 1 ORDER BY id""".stripMargin

  /** DuckDB replay of [[radiusPairs]] — a brute-force O(n²) pair scan
    * with the same exact distance predicate. Deliberately a DIFFERENT
    * construction: hash-equality against it proves the grid blocking is
    * LOSSLESS, not merely self-consistent.
    */
  def oracleSql(table: String, idCol: String, xCol: String, yCol: String,
                r: Long): String =
    s"""WITH p AS (
  SELECT CAST($idCol AS BIGINT) AS id, CAST($xCol AS BIGINT) AS x,
    CAST($yCol AS BIGINT) AS y
  FROM $table
  WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL AND $idCol IS NOT NULL)
SELECT a.id AS id_a, b.id AS id_b,
  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
FROM p a JOIN p b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= ${r * r}
ORDER BY id_a, id_b""".stripMargin
}
