package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audience overlap by HLL inclusion–exclusion — "how many users did
  * BOTH campaigns / BOTH years / BOTH surfaces reach" at constant
  * memory, the set-intersection readout the [[HllDistinct]] sketch
  * exists to make cheap: registers are max-mergeable, so the UNION's
  * estimate comes from folding the two cohorts' registers together
  * (never re-reading the data), and |A∩B| ≈ est(A) + est(B) −
  * est(A∪B). Every estimate is [[HllDistinct]]'s exact-integer
  * replayable form, so the published overlap is a deterministic
  * integer both engines agree on bit-for-bit.
  *
  * Honesty contract: the overlap is a DIFFERENCE of ~3%-error
  * estimates — its relative error scales with |A∪B|/|A∩B|, and small
  * true overlaps can publish as small NEGATIVES. The signed value is
  * published as-is (clamping would hide exactly the signal that says
  * "below sketch resolution"); readers clamp at consumption if they
  * must. Rows whose cohort label is neither `labelA` nor `labelB` are
  * excluded (declared); a group where one cohort is empty publishes
  * est 0 for it and overlap 0 exactly (inclusion–exclusion collapses).
  *
  * Scale shape: ONE partial-agg'd (group, cohort, bucket) register
  * max over the data, then register-sized re-aggregates — per group
  * the state is ≤ 2×1024 register rows forever; the cohort-union fold
  * is the same max-merge [[graft.streaming.HllIngest]] runs under
  * ingest, so this composes with maintained register stores.
  */
object HllOverlap {

  /** One row per group: (groupCols*, est_a, est_b, est_union,
    * est_overlap) with est_overlap = est_a + est_b − est_union
    * (signed — see the honesty contract above).
    */
  def overlap(df: DataFrame, groupCols: Seq[String], valueCol: String,
              cohortCol: String, labelA: String, labelB: String): DataFrame = {
    require(labelA != labelB, "labelA and labelB must differ")
    val in = df.where(col(cohortCol).cast("string").isin(labelA, labelB))
    val regs = HllDistinct.registers(
        in.withColumn("__cohort", col(cohortCol).cast("string")),
        groupCols :+ "__cohort", valueCol)
      .localCheckpoint(true)
    def est(regsIn: DataFrame, tag: String) =
      HllDistinct.estimateFromRegisters(regsIn, groupCols)
        .select((groupCols.zipWithIndex.map { case (c, i) =>
          col(c).as(s"__${tag}_g$i") } :+
          col("est_distinct").as(s"est_$tag")): _*)
    val a = est(regs.where(col("__cohort") === labelA)
      .drop("__cohort"), "a")
    val b = est(regs.where(col("__cohort") === labelB)
      .drop("__cohort"), "b")
    val u = est(regs.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("m_j")).as("m_j")), "union")
    def cond(tag: String) = groupCols.zipWithIndex.map { case (c, i) =>
      col(s"__union_g$i") <=> col(s"__${tag}_g$i") }.reduce(_ && _)
    val estA = coalesce(col("est_a"), lit(0L))
    val estB = coalesce(col("est_b"), lit(0L))
    u.join(a, cond("a"), "left").join(b, cond("b"), "left")
      .select((groupCols.zipWithIndex.map { case (c, i) =>
        col(s"__union_g$i").as(c) } ++ Seq(
        estA.as("est_a"), estB.as("est_b"),
        col("est_union"),
        (estA + estB - col("est_union")).as("est_overlap"))): _*)
  }

  /** DuckDB replay: three [[HllDistinct.oracleSql]] estimator runs —
    * cohort A, cohort B, and their union — joined by group.
    * `rowsSql` yields the filtered rows with a `__cohort` label
    * column; the estimator replays over subquery slices of it.
    */
  def oracleSql(rowsSql: String, groupCols: Seq[String], valueSql: String,
                labelA: String, labelB: String): String = {
    val g = groupCols.mkString(", ")
    def slice(where: String, alias: String) =
      "(" + HllDistinct.oracleSql(
        s"(SELECT * FROM ($rowsSql) WHERE $where) __$alias",
        groupCols, valueSql) + s") $alias"
    val uJoinA = groupCols.map(c => s"a.$c IS NOT DISTINCT FROM u.$c")
      .mkString(" AND ")
    val uJoinB = groupCols.map(c => s"b.$c IS NOT DISTINCT FROM u.$c")
      .mkString(" AND ")
    val gU = groupCols.map(c => s"u.$c").mkString(", ")
    s"""SELECT $gU,
  coalesce(a.est_distinct, 0) AS est_a,
  coalesce(b.est_distinct, 0) AS est_b,
  u.est_distinct AS est_union,
  coalesce(a.est_distinct, 0) + coalesce(b.est_distinct, 0)
    - u.est_distinct AS est_overlap
FROM ${slice(s"__cohort IN ('$labelA', '$labelB')", "u")}
LEFT JOIN ${slice(s"__cohort = '$labelA'", "a")} ON $uJoinA
LEFT JOIN ${slice(s"__cohort = '$labelB'", "b")} ON $uJoinB
ORDER BY $gU"""
  }
}
