package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative event-sequence pattern matching with NEGATION — the
  * MATCH_RECOGNIZE-lite the funnel family lacks: "A then B then C, each
  * within `maxGap` of the previous, with NO excluded event between the
  * matched steps". [[EventFunnels.funnel]] answers "how far did each
  * user get"; this answers "did the clean path happen" — checkout
  * without an error between, escalation without an agent reply,
  * retry-storm detection (the negation is the point: an error between
  * click and purchase means the purchase was NOT the click's clean
  * continuation).
  *
  * DECLARED greedy-NFA semantics (deterministic, both engines fold the
  * same machine): events scan in (ts, id) order restricted to the
  * RELEVANT types (steps ∪ excluded — scan-stage pre-filter, the funnel
  * posture); the machine anchors at the first `steps(0)`, advances on
  * the next expected step within `maxGap`, ABORTS the partial match on
  * any excluded-type event (restarting cold), re-anchors on a
  * gap-violating event iff that event is itself a `steps(0)`, re-anchors
  * on an anchor-type event whenever the running partial has gone STALE
  * (older than `maxGap` — without this one stale anchor could block
  * matching forever), ignores everything else, and FREEZES at the first
  * full match (first-match
  * semantics; later events cannot unmatch it). No backtracking: a
  * consumed anchor is not revisited — greedy, declared, replayable.
  *
  * Scale shape: one per-user collect of the pre-filtered relevant
  * events (bounded like funnels; `maxPoints` raises in-plan), one
  * linear fold per user, output one row per user.
  */
object SequenceMatch {

  /** One row per user: (userCol, n_relevant, matched, start_id, end_id)
    * — the ids of the first and last matched steps when matched.
    */
  def firstCleanMatch(events: DataFrame, steps: Seq[String],
                      excluded: Seq[String], maxGapMicros: Long,
                      userCol: String = "user_id", tsCol: String = "ts",
                      typeCol: String = "event_type", idCol: String = "event_id",
                      maxPoints: Long = 100000L): DataFrame = {
    require(steps.size >= 2, s"steps must have >= 2 entries, got ${steps.size}")
    require(steps.toSet.intersect(excluded.toSet).isEmpty,
      "a type cannot be both a step and excluded")
    require(maxGapMicros > 0, s"maxGapMicros must be positive, got $maxGapMicros")
    require(maxPoints >= 1, s"maxPoints must be >= 1, got $maxPoints")
    val k = steps.size
    val stepsArr = array(steps.map(lit): _*)
    val exclArr = array(excluded.map(lit): _*)
    val relevant = (steps ++ excluded).distinct
    val collected = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull && col(typeCol).isin(relevant: _*))
      .select(col(userCol).as("__u"),
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', " +
          s"CAST($tsCol AS TIMESTAMP_NTZ))").as("__ts"),
        col(idCol).cast("long").as("__id"), col(typeCol).as("__t"))
      .groupBy(col("__u"))
      .agg(sort_array(collect_list(struct(
        col("__ts").as("ts"), col("__id").as("id"), col("__t").as("t"))))
        .as("__arr"))
    val zero = expr("named_struct(" +
      "'stage', CAST(0 AS BIGINT), 'lts', CAST(0 AS BIGINT), " +
      "'sid', CAST(-1 AS BIGINT), 'eid', CAST(-1 AS BIGINT))")
    def cold = struct(lit(0L).as("stage"), lit(0L).as("lts"),
      lit(-1L).as("sid"), lit(-1L).as("eid"))
    val folded = collected.select(col("__u"),
      size(col("__arr")).cast("long").as("n_relevant"),
      (size(col("__arr")) > maxPoints).as("__over"),
      aggregate(col("__arr"), zero, (acc, e) => {
        val stage = acc.getField("stage")
        val isDone = stage === k
        val expect = element_at(stepsArr, (stage + 1).cast("int"))
        val isStep = e.getField("t") === expect
        val anchor = e.getField("t") === lit(steps.head)
        val within = stage === 0 ||
          (e.getField("ts") - acc.getField("lts")) <= maxGapMicros
        val advance = struct((stage + 1).as("stage"),
          e.getField("ts").as("lts"),
          when(stage === 0, e.getField("id")).otherwise(acc.getField("sid"))
            .as("sid"),
          e.getField("id").as("eid"))
        val reanchor = struct(lit(1L).as("stage"),
          e.getField("ts").as("lts"), e.getField("id").as("sid"),
          e.getField("id").as("eid"))
        when(isDone, acc)
          .when(isStep && within, advance)
          .when(isStep && !within, when(anchor, reanchor).otherwise(cold))
          .when(array_contains(exclArr, e.getField("t")) && stage > 0, cold)
          .when(anchor && stage > 0 &&
            (e.getField("ts") - acc.getField("lts")) > maxGapMicros, reanchor)
          .otherwise(acc)
      }).as("__f"))
    // the guard rides ALL THREE published columns (the holt discipline)
    def guarded(out: Column) =
      when(col("__over"), raise_error(concat(
        lit("sequenceMatch: user '"), col("__u").cast("string"),
        lit(s"' exceeds $maxPoints relevant events — tighten the type filter or raise maxPoints")))
        .cast("long"))
        .otherwise(out)
    folded.select(col("__u").as(userCol), col("n_relevant"),
      (guarded(when(col("__f").getField("stage") === k, lit(1L))
        .otherwise(lit(0L))) === 1L).as("matched"),
      guarded(when(col("__f").getField("stage") === k,
        col("__f").getField("sid"))).as("start_id"),
      guarded(when(col("__f").getField("stage") === k,
        col("__f").getField("eid"))).as("end_id"))
  }

  /** DuckDB replay — the same machine folded with `list_reduce` over the
    * same pre-filtered (ts, id)-ordered events; elements carry BOTH the
    * event fields and the acc shape (the no-init device: each element is
    * pre-mapped to its own cold-start fold result), the lambda reads
    * event fields from `e` and state from `acc`. `eventsSql` is the raw
    * table; steps/excluded are inlined as literals.
    */
  def oracleSql(table: String, steps: Seq[String], excluded: Seq[String],
                maxGapMicros: Long,
                userCol: String = "user_id", tsCol: String = "ts",
                typeCol: String = "event_type", idCol: String = "event_id"): String = {
    val k = steps.size
    def strList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("[", ", ", "]")
    val relevant = (steps ++ excluded).distinct
    val stepsL = strList(steps)
    val exclL = strList(excluded)
    val stg = "acc.stage"
    val expect = s"($stepsL)[CAST($stg + 1 AS INT)]"
    val within = s"($stg = 0 OR e.ts - acc.lts <= $maxGapMicros)"
    val advance = s"{'stage': $stg + 1, 'lts': e.ts, " +
      s"'sid': CASE WHEN $stg = 0 THEN e.id ELSE acc.sid END, 'eid': e.id, " +
      "'ts': e.ts, 'id': e.id, 't': e.t}"
    val reanchor = "{'stage': CAST(1 AS BIGINT), 'lts': e.ts, 'sid': e.id, " +
      "'eid': e.id, 'ts': e.ts, 'id': e.id, 't': e.t}"
    val cold = "{'stage': CAST(0 AS BIGINT), 'lts': CAST(0 AS BIGINT), " +
      "'sid': CAST(-1 AS BIGINT), 'eid': CAST(-1 AS BIGINT), " +
      "'ts': e.ts, 'id': e.id, 't': e.t}"
    val keep = s"{'stage': $stg, 'lts': acc.lts, 'sid': acc.sid, " +
      "'eid': acc.eid, 'ts': e.ts, 'id': e.id, 't': e.t}"
    s"""WITH ev AS (SELECT $userCol AS u,
    date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00',
      CAST($tsCol AS TIMESTAMP)) AS ts,
    CAST($idCol AS BIGINT) AS id, $typeCol AS t
  FROM $table
  WHERE $userCol IS NOT NULL AND $tsCol IS NOT NULL AND $idCol IS NOT NULL
    AND $typeCol IN (${relevant.map(s => s"'$s'").mkString(", ")})),
arr AS (SELECT u, CAST(count(*) AS BIGINT) AS n_relevant,
    list({'ts': ts, 'id': id, 't': t} ORDER BY ts, id, t) AS a
  FROM ev GROUP BY u),
pre AS (SELECT u, n_relevant, list_transform(a, e ->
    CASE WHEN e.t = ($stepsL)[1]
      THEN {'stage': CAST(1 AS BIGINT), 'lts': e.ts, 'sid': e.id,
            'eid': e.id, 'ts': e.ts, 'id': e.id, 't': e.t}
      ELSE {'stage': CAST(0 AS BIGINT), 'lts': CAST(0 AS BIGINT),
            'sid': CAST(-1 AS BIGINT), 'eid': CAST(-1 AS BIGINT),
            'ts': e.ts, 'id': e.id, 't': e.t} END) AS a
  FROM arr),
f AS (SELECT u, n_relevant, list_reduce(a, (acc, e) ->
    CASE WHEN $stg = $k THEN
      {'stage': $stg, 'lts': acc.lts, 'sid': acc.sid, 'eid': acc.eid,
       'ts': e.ts, 'id': e.id, 't': e.t}
    WHEN e.t = $expect AND $within THEN $advance
    WHEN e.t = $expect AND NOT $within THEN
      CASE WHEN e.t = ($stepsL)[1] THEN $reanchor ELSE $cold END
    WHEN list_contains($exclL, e.t) AND $stg > 0 THEN $cold
    WHEN e.t = ($stepsL)[1] AND $stg > 0 AND e.ts - acc.lts > $maxGapMicros
      THEN $reanchor
    ELSE $keep END) AS r
  FROM pre)
SELECT u AS $userCol, n_relevant, r.stage = $k AS matched,
  CASE WHEN r.stage = $k THEN r.sid END AS start_id,
  CASE WHEN r.stage = $k THEN r.eid END AS end_id
FROM f ORDER BY u"""
  }
}
