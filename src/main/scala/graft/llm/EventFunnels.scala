package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream: for each user, how far
  * through S1 → S2 → … → Sk did they get, taking each step at its EARLIEST
  * eligible time (greedy-from-first-touch, the standard product-analytics
  * funnel semantic)? Progression is strict in time (a later step needs
  * `t > t_prev`), and an optional conversion horizon bounds the whole walk
  * to `t1 + horizon`.
  *
  * Greedy-earliest is exact for the unbounded funnel: minimizing t_i can
  * only enlarge the candidate set for step i+1, so the greedy walk reaches
  * the maximal completed step. With a horizon it is the conventional
  * first-touch contract (the horizon anchors at the user's FIRST S1, not
  * the best one) — documented, and mirrored exactly by the oracle.
  *
  * Scale shape (100 TB of events): events are filtered to the k funnel
  * types AT THE SCAN (codegen'd isin — typically a tiny fraction survives),
  * then ONE shuffle on user_id; the per-user fold runs over the sorted
  * per-user funnel events (collect_list bounded by the user's funnel-event
  * count — for whale users beyond memory, the k-pass iterative-min variant
  * trades k keyed shuffles for O(1) state; this one-pass form is the right
  * default). Timestamps fold as exact integer micros, so results are
  * partitioning-independent and engine-replayable.
  */
object EventFunnels {

  /** Per-user funnel walk: (`userCol`, steps_completed, first_us,
    * convert_us). Every user in `events` appears; users with no S1 have
    * steps_completed = 0 and null times; convert_us (tk − t1) is non-null
    * only for full completers.
    */
  def funnel(
      events: DataFrame, steps: Seq[String],
      horizonUs: Option[Long] = None,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel requires at least one step")
    val k = steps.length
    // event type → 1-based step index (events outside the funnel are
    // filtered before the shuffle, so only funnel rows move)
    val si = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    val e = events
      .where(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        unix_micros(col(tsCol).cast("timestamp")).as("t"), si.as("si"))

    val nullT = lit(null).cast("long")
    val zero = struct(lit(0).as("step"), nullT.as("t1"), nullT.as("tprev"))
    val folded = e.groupBy(userCol)
      .agg(sort_array(collect_list(struct(col("t"), col("si")))).as("evs"))
      .select(col(userCol), aggregate(col("evs"), zero, (acc, ev) => {
        val inHorizon = horizonUs match {
          case Some(h) => acc("step") === 0 || ev("t") <= acc("t1") + lit(h)
          case None    => lit(true)
        }
        val advance = acc("step") < k &&
          ev("si") === acc("step") + 1 &&
          (acc("step") === 0 || ev("t") > acc("tprev")) &&
          inHorizon
        when(advance, struct(
          (acc("step") + 1).as("step"),
          when(acc("step") === 0, ev("t")).otherwise(acc("t1")).as("t1"),
          ev("t").as("tprev"))).otherwise(acc)
      }).as("st"))

    events.select(col(userCol)).distinct()
      .join(folded, Seq(userCol), "left")
      .select(
        col(userCol),
        coalesce(col("st.step"), lit(0)).as("steps_completed"),
        col("st.t1").as("first_us"),
        when(col("st.step") === k, col("st.tprev") - col("st.t1")).as("convert_us"))
  }

  /** Step-conversion summary: users reaching at least step i, for i = 1..k —
    * the funnel chart. One extra tiny aggregation over [[funnel]]'s output.
    */
  def funnelSummary(perUser: DataFrame, k: Int): DataFrame =
    perUser
      .select(explode(sequence(lit(1), lit(k))).as("step"), col("steps_completed"))
      .groupBy("step")
      .agg(sum(when(col("steps_completed") >= col("step"), 1L).otherwise(0L)).as("n_users"))

  /** Time-to-convert distribution for FULL completers — the funnel
    * chart's companion ("how long does view→purchase take, p50/p90"):
    * one grand aggregate over [[funnel]]'s per-user frame folding
    * `convert_us` through the KLL summary ([[graft.functions.QuantileSketch]]
    * — bounded buffer per partition, EXACT below 2k values, the regime
    * the gate asserts). Always exactly one row; an empty converter set
    * yields (0, NULL…) on both engines.
    */
  def funnelLatency(perUser: DataFrame, k: Int = 4096,
                    qs: Seq[(Long, Long)] =
                      Seq((1L, 4L), (1L, 2L), (3L, 4L), (9L, 10L)),
                    names: Seq[String] =
                      Seq("p25_us", "p50_us", "p75_us", "p90_us")): DataFrame = {
    require(names.length == qs.length, "one name per fraction")
    val conv = perUser.where(col("convert_us").isNotNull)
    conv.agg(count(lit(1)).as("n_converters"),
        graft.functions.Quantiles(k, qs)(col("convert_us")).as("__q"))
      .select(col("n_converters") +: names.zipWithIndex.map { case (n, i) =>
        try_element_at(col("__q"), lit(i + 1)).as(n)
      }: _*)
  }

  /** DuckDB replay of [[funnelLatency]] in the exact regime —
    * `quantile_disc` IS the "smallest value with cumulative count ≥ ⌈φ·n⌉"
    * rule the KLL summary reports below compaction.
    */
  def latencyOracle(table: String, steps: Seq[String],
                    horizonUs: Option[Long] = None,
                    qs: Seq[(Long, Long)] =
                      Seq((1L, 4L), (1L, 2L), (3L, 4L), (9L, 10L)),
                    names: Seq[String] =
                      Seq("p25_us", "p50_us", "p75_us", "p90_us"),
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type"): String = {
    val qcols = qs.zip(names).map { case ((num, den), n) =>
      s"CAST(quantile_disc(convert_us, $num.0/$den) AS BIGINT) AS $n"
    }.mkString(", ")
    s"""WITH f AS (${funnelOracle(table, steps, horizonUs, userCol, tsCol, typeCol)}),
c AS (SELECT convert_us FROM f WHERE convert_us IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_converters, $qcols FROM c""".stripMargin
  }

  // ------------------------------------------------- DuckDB oracle SQL ----

  /** Oracle for [[funnel]]: the k-pass iterative-min formulation (each step's
    * time = min eligible time given the previous step) — provably the same
    * walk as the sorted fold, stated independently, so the gate pins the
    * one-pass implementation against the textbook definition.
    */
  def funnelOracle(
      table: String, steps: Seq[String],
      horizonUs: Option[Long] = None,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): String = {
    val k = steps.length
    val stepCase = steps.zipWithIndex
      .map { case (s, i) => s"WHEN '$s' THEN ${i + 1}" }.mkString(" ")
    val ctes = (1 to k).map { i =>
      if (i == 1)
        s"s1 AS (SELECT $userCol, min(t) AS t1 FROM e WHERE si = 1 GROUP BY $userCol)"
      else {
        // t1 for the horizon bound comes from s1 — already in scope when
        // i == 2 (s_{i-1} IS s1); only deeper steps join s1 again
        val s1Join = if (i > 2 && horizonUs.isDefined) s" JOIN s1 USING ($userCol)" else ""
        val h = horizonUs.map(hu => s" AND e.t <= s1.t1 + $hu").getOrElse("")
        s"""s$i AS (SELECT e.$userCol, min(e.t) AS t$i FROM e
JOIN s${i - 1} USING ($userCol)$s1Join
WHERE e.si = $i AND e.t > s${i - 1}.t${i - 1}$h GROUP BY e.$userCol)"""
      }
    }.mkString(",\n")
    val stepExpr = (k to 1 by -1).map(i => s"WHEN t$i IS NOT NULL THEN $i").mkString(" ")
    val joins = (1 to k).map(i => s"LEFT JOIN s$i USING ($userCol)").mkString(" ")
    s"""WITH e AS (SELECT $userCol, epoch_us($tsCol) AS t,
  CASE $typeCol $stepCase END AS si
  FROM $table WHERE $typeCol IN (${steps.map(s => s"'$s'").mkString(", ")})),
$ctes,
u AS (SELECT DISTINCT $userCol FROM $table)
SELECT u.$userCol, CASE $stepExpr ELSE 0 END AS steps_completed,
  t1 AS first_us, t$k - t1 AS convert_us
FROM u $joins ORDER BY u.$userCol""".stripMargin
  }
}
