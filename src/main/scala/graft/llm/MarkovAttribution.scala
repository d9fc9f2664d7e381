package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution — which channel actually CARRIES
  * conversions: last-touch ([[graft.operators.Travel]]-style rules) and
  * position rules (L231's U-shape) DECLARE credit; the Markov model
  * MEASURES it — build the conversion-truncated transition graph, ask
  * "what is the conversion probability from START", then re-ask with
  * each channel knocked out (transitions into it become dead ends);
  * the drop is the channel's removal effect, the standard data-driven
  * attribution readout.
  *
  * Absorption probabilities are usually solved by matrix inversion in
  * floats; here the walk runs a DECLARED `rounds`-hop damping-free
  * power iteration with per-step quantization — p_r(s) = ⌊Σ_t c(s,t)·
  * v_r(t) / Σ_t c(s,t)⌋ in 10⁻⁶ units, v fixed at 10⁶ on CONV, 0 on
  * END and on the removed channel — so p_r(START) is EXACTLY the
  * (quantized) probability of converting within r hops and the
  * unrolled-CTE oracle replays every round bit-for-bit (the L78/L253
  * bounded-rounds device; bias per round ≤ 1 micro-unit, and the
  * within-r-hops semantics are declared, not an approximation).
  *
  * Scale shape: path extraction is one user-partitioned window pass
  * (wall-clock posture); everything after lives on the |types|²-bounded
  * transition matrix — the per-round joins and the |channels|+1
  * parallel walks are states-sized, and the channel list is a tiny
  * metadata collect (the BpeTrain heartbeat precedent). NULL
  * ts/id/type rows drop; paths truncate at the FIRST conversion
  * (standard: later journeys re-enter via their own events only if a
  * caller re-windows upstream).
  */
object MarkovAttribution {

  val Scale = 1000000L
  val Start = "__START"
  val End = "__END"

  /** Conversion-truncated transition counts: (src, dst, n) with START
    * rows, END sinks for non-converting paths, and no rows out of the
    * absorbing conversion state.
    */
  def conversionTransitions(events: DataFrame, userCol: String,
                            tsCol: String, typeCol: String, idCol: String,
                            convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val ranked = events
      .where(col(tsCol).isNotNull && col(idCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        row_number().over(w).as("__rn"))
    val firstConv = ranked.where(col("__t") === convType)
      .groupBy(col("__u")).agg(min(col("__rn")).as("__cv"))
    val kept = ranked.join(firstConv, Seq("__u"), "left")
      .where(col("__cv").isNull || col("__rn") <= col("__cv"))
    val w2 = Window.partitionBy(col("__u")).orderBy(col("__rn"))
    val chains = kept
      .select(col("__u"), col("__t").as("src"),
        coalesce(lead(col("__t"), 1).over(w2), lit(End)).as("dst"),
        col("__rn"))
    chains.where(col("src") =!= convType).select(col("src"), col("dst"))
      .union(kept.where(col("__rn") === 1)
        .select(lit(Start).as("src"), col("__t").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
  }

  /** (channel, p_base_q6, p_removed_q6) — conversion probability from
    * START within `rounds` hops, with and without each channel.
    */
  def removalEffects(events: DataFrame, userCol: String = "user_id",
                     tsCol: String = "ts", typeCol: String = "event_type",
                     idCol: String = "event_id", convType: String,
                     rounds: Int = 6): DataFrame = {
    require(rounds >= 1 && rounds <= 32,
      s"rounds must be in [1, 32], got $rounds")
    require(!Seq(Start, End, "__BASE").contains(convType),
      s"convType '$convType' collides with a reserved pseudo-state")
    val spark = events.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val tr = conversionTransitions(events, userCol, tsCol, typeCol, idCol,
      convType).localCheckpoint(true)
    val chans = tr.select(col("src")).where(col("src") =!= Start)
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    require(chans.nonEmpty, "removalEffects: no non-START source states")
    val reserved = chans.toSet.intersect(Set(Start, End, "__BASE"))
    require(reserved.isEmpty,
      s"removalEffects: event type(s) ${reserved.mkString(", ")} collide " +
        "with the reserved pseudo-states — rename channels upstream " +
        "(a '__BASE' channel would silently corrupt every walk)")
    require(chans.size <= 64,
      s"removalEffects: ${chans.size} channels — a ${chans.size + 1}-walk " +
        "states-matrix explosion; collapse channel taxonomy upstream")
    val walks = (chans :+ "__BASE").toDF("walk")
    val states = tr.select(col("src").as("state")).distinct()
    var p = walks.crossJoin(states).withColumn("p_q6", lit(0L))
    for (_ <- 1 to rounds) {
      val prev = p.select(col("walk").as("__w"), col("state").as("__dst"),
        col("p_q6").as("__pp"))
      val v = when(col("dst") === convType, lit(Scale))
        .when(col("dst") === End, lit(0L))
        .when(col("dst") === col("walk"), lit(0L))
        .otherwise(coalesce(col("__pp"), lit(0L)))
      p = walks.crossJoin(broadcast(tr))
        .join(prev, col("walk") === col("__w") && col("dst") === col("__dst"),
          "left")
        .groupBy(col("walk"), col("src").as("state"))
        .agg(call_function("div",
          sum((col("n") * v).cast(dec)),
          sum(col("n").cast(dec))).as("p_q6"))
        .localCheckpoint(true)
    }
    val startP = p.where(col("state") === Start)
      .select(col("walk"), col("p_q6"))
    val base = startP.where(col("walk") === "__BASE")
      .select(col("p_q6").as("p_base_q6"))
    startP.where(col("walk") =!= "__BASE")
      .crossJoin(broadcast(base))
      .select(col("walk").as("channel"), col("p_base_q6"),
        col("p_q6").as("p_removed_q6"))
  }

  /** DuckDB replay of [[removalEffects]] — the transition SQL plus
    * `rounds` MATERIALIZED per-round CTEs (each referenced once per
    * next round, but materialized anyway per the unrolled-CTE law).
    */
  def oracleSql(table: String, userCol: String, tsCol: String,
                typeCol: String, idCol: String, convType: String,
                rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
  SELECT w.walk, tr.src AS state,
    CAST(sum(CAST(tr.n AS HUGEINT) *
      CASE WHEN tr.dst = '$convType' THEN $Scale
           WHEN tr.dst = '$End' THEN 0
           WHEN tr.dst = w.walk THEN 0
           ELSE coalesce(q.p_q6, 0) END)
      // sum(CAST(tr.n AS HUGEINT)) AS BIGINT) AS p_q6
  FROM ch w CROSS JOIN tr
  LEFT JOIN p${r - 1} q ON q.walk = w.walk AND q.state = tr.dst
  GROUP BY w.walk, tr.src)"""
    }.mkString(",\n")
    s"""WITH ranked AS (
  SELECT $userCol AS u, $typeCol AS t,
    row_number() OVER (PARTITION BY $userCol ORDER BY $tsCol, $idCol) AS rn
  FROM $table
  WHERE $tsCol IS NOT NULL AND $idCol IS NOT NULL AND $typeCol IS NOT NULL),
fc AS (SELECT u, min(rn) AS cv FROM ranked WHERE t = '$convType' GROUP BY u),
k AS (SELECT ranked.* FROM ranked LEFT JOIN fc USING (u)
  WHERE cv IS NULL OR rn <= cv),
chains AS (
  SELECT u, t AS src,
    coalesce(lead(t) OVER (PARTITION BY u ORDER BY rn), '$End') AS dst, rn
  FROM k),
tr AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT src, dst FROM chains WHERE src <> '$convType'
    UNION ALL
    SELECT '$Start' AS src, t AS dst FROM k WHERE rn = 1)
  GROUP BY src, dst),
ch AS (SELECT DISTINCT src AS walk FROM tr WHERE src <> '$Start'
  UNION ALL SELECT '__BASE'),
st AS (SELECT DISTINCT src AS state FROM tr),
p0 AS (SELECT walk, state, CAST(0 AS BIGINT) AS p_q6 FROM ch, st),
$roundCtes
SELECT s.walk AS channel, b.p_q6 AS p_base_q6, s.p_q6 AS p_removed_q6
FROM p$rounds s, p$rounds b
WHERE s.state = '$Start' AND s.walk <> '__BASE'
  AND b.state = '$Start' AND b.walk = '__BASE'
ORDER BY channel"""
  }
}
