package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise DTW distance matrix over per-group series — which groups'
  * time-shapes move together once local time shifts are forgiven:
  * cluster product lines by demand shape, match a new series to its
  * nearest historical analog, flag the segment whose curve diverged from
  * the cohort. Euclidean comparisons (L140's correlation matrix) punish
  * a one-period lag; DTW aligns it away — the complementary member.
  *
  * Exact semantics: each group's series collects sorted by idx (the
  * alignment consumes ORDER, so feed the [[DenseSeries]] spine — equal
  * spacing is the caller's contract); duplicate indexes raise in-plan,
  * groups above `maxPoints` raise BEFORE the O(n·m) DP can run away
  * (the [[ExpSmooth]] discipline, cost-quadratic here so the guard
  * matters twice). The DP itself is the native [[graft.functions.DtwCost]]
  * expression — exact Longs, `band` for the Sakoe–Chiba production cut
  * (`<= 0` = full DP, the gate's replayable form).
  *
  * Scale shape: one collect per group (calendar-sized arrays), then the
  * pair enumeration is a groups×groups self-join — DECLARED small (a
  * series-comparison audit over segments/cohorts, not a corpus op; the
  * frame is groups-sized, the join broadcast). Each pair costs one
  * codegen'd DP call.
  */
object Dtw {

  /** Unordered pairs (group_a < group_b): (group_a, group_b, n_a, n_b,
    * dtw). NULL dtw only for empty series (cannot happen post-collect).
    */
  def pairwiseMatrix(df: DataFrame, groupCol: String, idxCol: String,
                     valueCol: String, band: Int = 0,
                     maxPoints: Long = 10000L): DataFrame = {
    graft.Guards.requireIntegral(df, idxCol, "dtw")
    graft.Guards.requireIntegral(df, valueCol, "dtw")
    require(maxPoints >= 1, s"maxPoints must be >= 1, got $maxPoints")
    val collected = df
      .where(col(idxCol).isNotNull && col(valueCol).isNotNull &&
        col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(
        col(idxCol).cast("long").as("i"),
        col(valueCol).cast("long").as("x")))).as("__arr"))
      .select(col(groupCol),
        (size(col("__arr")) =!=
          size(array_distinct(transform(col("__arr"), e => e.getField("i")))))
          .as("__dup"),
        (size(col("__arr")) > maxPoints).as("__over"),
        size(col("__arr")).cast("long").as("__n"),
        transform(col("__arr"), e => e.getField("x")).as("__vals"))
    val l = collected.select(col(groupCol).as("group_a"),
      col("__dup").as("__dupa"), col("__over").as("__overa"),
      col("__n").as("n_a"), col("__vals").as("__va"))
    val r = collected.select(col(groupCol).as("group_b"),
      col("__dup").as("__dupb"), col("__over").as("__overb"),
      col("__n").as("n_b"), col("__vals").as("__vb"))
    val raw = graft.functions.DtwCost(col("__va"), col("__vb"), band)
    val guarded = when(col("__dupa") || col("__dupb"), raise_error(concat(
      lit("dtw: duplicate idx within group '"),
      when(col("__dupa"), col("group_a")).otherwise(col("group_b")).cast("string"),
      lit("' — the alignment order would be data-dependent")))
      .cast("long"))
      .when(col("__overa") || col("__overb"), raise_error(concat(
        lit("dtw: a group exceeds "), lit(maxPoints).cast("string"),
        lit(" points — the DP is quadratic; pre-aggregate onto a coarser spine")))
        .cast("long"))
      .otherwise(raw)
    l.join(r, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        guarded.as("dtw"))
  }

  /** DuckDB replay of the FULL-DP form (band <= 0) — the rolling-row DP
    * as a nested `list_reduce` (no-init reduce device, twice): the FIRST
    * outer element is the true first DP row (cumulative |aᵢ − b₁|, built
    * once, O(n²)) so it becomes the accumulator verbatim; every LATER
    * element is just the singleton [bⱼ], and the inner reduce folds the
    * min-recurrence left-to-right with its own first element carrying
    * the row seed [acc[1] + |a₁ − bⱼ|]. O(n·m) after the first row —
    * same asymptotics as the native expression. `seriesSql` yields
    * (grp, i, x).
    */
  def pairwiseOracle(seriesSql: String, aName: String, bName: String): String =
    s"""WITH arr AS (SELECT grp, list(x ORDER BY i) AS a,
    CAST(count(*) AS BIGINT) AS n
  FROM ($seriesSql)
  WHERE grp IS NOT NULL AND i IS NOT NULL AND x IS NOT NULL
  GROUP BY grp),
p AS (SELECT l.grp AS ga, r.grp AS gb, l.a AS aa, r.a AS ab,
    l.n AS na, r.n AS nb
  FROM arr l JOIN arr r ON l.grp < r.grp),
d AS (SELECT ga, gb, na, nb,
  list_reduce(
    list_prepend(
      list_transform(range(1, len(aa) + 1),
        i -> list_sum(list_transform(aa[1:i], v -> abs(v - ab[1])))),
      list_transform(ab[2:len(ab)], bj -> [bj])),
    (acc, e) -> list_reduce(
      list_prepend([acc[1] + abs(aa[1] - e[1])],
        list_transform(range(2, len(aa) + 1), i -> [CAST(NULL AS BIGINT)])),
      (nr, el) -> list_append(nr,
        least(acc[len(nr) + 1], acc[len(nr)], nr[len(nr)]) +
          abs(aa[len(nr) + 1] - e[1]))))
  [len(aa)] AS dtw
FROM p)
SELECT ga AS $aName, gb AS $bName, na AS n_a, nb AS n_b,
  CAST(dtw AS BIGINT) AS dtw
FROM d ORDER BY ga, gb"""
}
