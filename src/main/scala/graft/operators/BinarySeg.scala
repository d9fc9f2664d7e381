package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary segmentation — MULTIPLE change points, recursively:
  * [[ChangePoint.meanShiftScan]] finds the single maximum-likelihood
  * mean shift; real series re-level more than once (a deploy, then a
  * rollback, then the fix), and the classical answer is to split at
  * the best point, then recurse into both halves while the evidence
  * clears a declared bar. Everything stays the exact-integer D
  * statistic: within a segment of length n, D_i = n·P_i − i·T
  * (cross-multiplied, DECIMAL(38,0)), the best split the
  * `max(struct(|D|, −i))` reduction, ACCEPTED when |D| ≥ `minDev`
  * (the caller's absolute evidence bar, value·n-scaled — the Cusum h
  * convention) and both children carry ≥ `minSize` points.
  *
  * The recursion is a DRIVER loop of `maxDepth` rounds over a bounded
  * segments artifact (≤ 2^depth per group — the KMeans bounded-collect
  * posture): each round joins rows to the broadcast segment table,
  * computes every active segment's best split in one windowed pass,
  * and the accepted splits become next round's children. Duplicate
  * idx raises in-plan (position order must be total); NULL idx/value
  * drop; output is (group, split_pos, split_idx, abs_dev, depth) —
  * split_pos the 1-based position within the group's series, split_idx
  * the idx VALUE at the split (the last point of the left child).
  */
object BinarySeg {

  def changePoints(df: DataFrame, groupCol: String, idxCol: String,
                   valueCol: String, minSize: Int, minDev: Long,
                   maxDepth: Int): DataFrame = {
    require(minSize >= 1, s"minSize must be positive, got $minSize")
    require(minDev >= 0, s"minDev must be non-negative, got $minDev")
    require(maxDepth >= 1 && maxDepth <= 10,
      s"maxDepth must be in [1, 10], got $maxDepth")
    graft.Guards.requireIntegral(df, idxCol, "binarySeg")
    graft.Guards.requireIntegral(df, valueCol, "binarySeg")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val perI = Window.partitionBy(col(groupCol), col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val posW = Window.partitionBy(col(groupCol)).orderBy(col("__i"))
    val rows = df
      .where(col(idxCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(idxCol).cast("long").as("__i"),
        col(valueCol).cast("long").as("__x"))
      .withColumn("__ni", count(lit(1)).over(
        Window.partitionBy(col("__g"), col("__i"))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .withColumn("__i",
        when(col("__ni") > 1L, raise_error(concat(
          lit("binarySeg: duplicate idx within group '"), col("__g"),
          lit("' — the position order must be total"))).cast("long"))
          .otherwise(col("__i")))
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__i"))).cast("long"))
      .select(col("__g"), col("__pos"), col("__i"), col("__x"))
      .localCheckpoint(true)
    // initial segments: each group's full range — a bounded driver
    // artifact (groups × 2^depth rows, the KMeans posture)
    var segments: Seq[(String, Long, Long)] = rows
      .groupBy(col("__g")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), 1L, r.getLong(1))).toSeq
    val found = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Int)]
    var depth = 0
    while (depth < maxDepth && segments.nonEmpty) {
      depth += 1
      val segDf = broadcast(
        segments.toDF("__sg", "__lo", "__hi").localCheckpoint(true))
      // null-safe group match: a NULL group is a real stratum (the
      // TheilSen/Siegel r10 fix class)
      val seg = rows.join(segDf,
        col("__g") <=> col("__sg") &&
          col("__pos").between(col("__lo"), col("__hi")))
      val w = Window.partitionBy(col("__g"), col("__lo"))
        .orderBy(col("__pos"))
      val stats = seg
        .withColumn("__p", sum(col("__x")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__t", sum(col("__x")).over(
          Window.partitionBy(col("__g"), col("__lo"))
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        .withColumn("__n", (col("__hi") - col("__lo") + 1L))
        .withColumn("__k", col("__pos") - col("__lo") + 1L)
        .where(col("__k") >= minSize.toLong &&
          col("__n") - col("__k") >= minSize.toLong)
        .withColumn("__d",
          abs(col("__n").cast(dec) * col("__p").cast(dec) -
            col("__k").cast(dec) * col("__t").cast(dec)))
      val best = stats.groupBy(col("__g"), col("__lo"), col("__hi"))
        .agg(max(struct(col("__d"), (-col("__pos")).as("__negPos"),
          col("__i"))).as("__b"))
        .select(col("__g"), col("__lo"), col("__hi"),
          col("__b.__d").as("__d"), (-col("__b.__negPos")).as("__pos"),
          col("__b.__i").as("__i"))
        .where(col("__d") >= lit(minDev).cast(dec))
        .collect()
      val next = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      best.foreach { r =>
        val (g, lo, hi) = (r.getString(0), r.getLong(1), r.getLong(2))
        val pos = r.getLong(4)
        found += ((g, pos, r.getLong(5),
          r.getDecimal(3).toBigInteger.longValueExact, depth))
        if (pos - lo + 1 >= 2L * minSize) next += ((g, lo, pos))
        if (hi - pos >= 2L * minSize) next += ((g, pos + 1, hi))
      }
      segments = next.toSeq
    }
    found.toSeq
      .toDF("__g", "split_pos", "split_idx", "abs_dev", "depth")
      .withColumnRenamed("__g", groupCol)
      .select(col(groupCol), col("split_pos"), col("split_idx"),
        col("abs_dev"), col("depth").cast("long").as("depth"))
  }

  /** DuckDB replay: `maxDepth` unrolled rounds, each one a
    * segments-join + windowed prefix sums + a rank-1 pick — the same
    * plan the Spark loop runs; `seriesSql` yields (grp, i, x).
    */
  def oracleSql(seriesSql: String, groupName: String, minSize: Int,
                minDev: Long, maxDepth: Int): String = {
    val rounds = (1 to maxDepth).map { r =>
      s"""st$r AS MATERIALIZED (
  SELECT s.grp, s.lo, s.hi, rw.pos, rw.i,
    sum(rw.x) OVER (PARTITION BY s.grp, s.lo ORDER BY rw.pos
      ROWS UNBOUNDED PRECEDING) AS pf,
    sum(rw.x) OVER (PARTITION BY s.grp, s.lo) AS tf
  FROM seg$r s JOIN rws rw
    ON rw.grp = s.grp AND rw.pos BETWEEN s.lo AND s.hi),
b$r AS MATERIALIZED (
  SELECT grp, lo, hi, pos, i, dev FROM (
    SELECT grp, lo, hi, pos, i,
      abs(CAST(hi - lo + 1 AS HUGEINT) * pf
        - CAST(pos - lo + 1 AS HUGEINT) * tf) AS dev,
      row_number() OVER (PARTITION BY grp, lo
        ORDER BY abs(CAST(hi - lo + 1 AS HUGEINT) * pf
          - CAST(pos - lo + 1 AS HUGEINT) * tf) DESC, pos ASC) AS rk
    FROM st$r
    WHERE pos - lo + 1 >= $minSize
      AND (hi - lo + 1) - (pos - lo + 1) >= $minSize)
  WHERE rk = 1 AND dev >= $minDev),
f$r AS (SELECT grp, pos AS split_pos, i AS split_idx, dev, $r AS depth
  FROM b$r),
seg${r + 1} AS MATERIALIZED (
  SELECT grp, lo, pos AS hi FROM b$r WHERE pos - lo + 1 >= ${2 * minSize}
  UNION ALL
  SELECT grp, pos + 1 AS lo, hi FROM b$r WHERE hi - pos >= ${2 * minSize})"""
    }
    val unionAll = (1 to maxDepth).map(r => s"SELECT * FROM f$r")
      .mkString("\nUNION ALL ")
    s"""WITH rws AS MATERIALIZED (
  SELECT grp, CAST(row_number() OVER (PARTITION BY grp ORDER BY i)
    AS BIGINT) AS pos, i, x
  FROM ($seriesSql) WHERE i IS NOT NULL AND x IS NOT NULL),
seg1 AS MATERIALIZED (
  SELECT grp, CAST(1 AS BIGINT) AS lo, CAST(count(*) AS BIGINT) AS hi
  FROM rws GROUP BY grp),
${rounds.mkString(",\n")}
SELECT grp AS $groupName, split_pos, split_idx,
  CAST(dev AS BIGINT) AS abs_dev, CAST(depth AS BIGINT) AS depth
FROM ($unionAll)
ORDER BY $groupName, split_pos"""
  }
}
