package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-bucket rate-limit replay — "WOULD this event stream have been
  * throttled at rate r with burst B": the capacity-planning /
  * abuse-forensics readout run before a limiter ships (how many users
  * would a proposed limit hit, which requests would 429, where do
  * retry storms start). The classical limiter: a bucket of `burst`
  * tokens refilling at `rateNum` tokens per `rateDen` ticks; each
  * event needs one token — admitted if available, rejected otherwise
  * (rejections do NOT consume).
  *
  * Exactness by unit choice, not division: levels are tracked in
  * 1/rateDen-token units, so the refill over a gap of Δt ticks is the
  * exact integer Δt·rateNum, capacity is burst·rateDen, one admission
  * costs rateDen — the whole recurrence
  *
  *   pre_t = min(burst·rateDen, level_{t−1} + Δt·rateNum)
  *   admitted_t = pre_t ≥ rateDen;  level_t = pre_t − rateDen·[admitted]
  *
  * is min/plus integer arithmetic with NO division anywhere, replayed
  * bit-for-bit by the DuckDB fold. The bucket starts FULL at the first
  * event (declared; with burst ≥ 1 the first event is always admitted).
  *
  * Events order by (idx, id) — the id tiebreak makes same-tick bursts
  * deterministic (Δt = 0 between them, so they drain the bucket in id
  * order); duplicate ids within a key raise in-plan, as do groups past
  * `maxPoints` (the ExpSmooth fold posture: per-key sequences are
  * session-scale by contract). NULL key groups are real strata; NULL
  * idx/id rows drop.
  */
object TokenBucket {

  /** One row per event: (keyCol, id, idx, admitted, level_q) with
    * level_q the post-event level in 1/rateDen tokens.
    */
  def replay(df: DataFrame, keyCol: String, idxCol: String, idCol: String,
             rateNum: Long, rateDen: Long, burst: Long,
             maxPoints: Long = 100000L, preCheck: Boolean = true): DataFrame = {
    require(rateNum > 0 && rateDen > 0,
      s"rate must be positive, got $rateNum/$rateDen")
    require(burst >= 1, s"burst must be >= 1, got $burst")
    require(maxPoints >= 1, s"maxPoints must be >= 1, got $maxPoints")
    graft.Guards.requireIntegral(df, idxCol, "tokenBucket")
    graft.Guards.requireIntegral(df, idCol, "tokenBucket")
    val overMsg = concat(
      lit("tokenBucket: key '"), col(keyCol).cast("string"),
      lit(s"' exceeds $maxPoints events — raise maxPoints deliberately"))
    val rows0 = df
      .where(col(idxCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol), col(idxCol).cast("long").as("__i"),
        col(idCol).cast("long").as("__id"))
    val rows =
      if (preCheck) FoldGuard.preBound(rows0, keyCol, "__i", maxPoints, overMsg)
      else rows0
    val collected = rows
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col("__i").as("i"), col("__id").as("id")))).as("__arr"))
    val folded = collected.select(col(keyCol),
      (size(col("__arr")) =!=
        size(array_distinct(transform(col("__arr"), e => e.getField("id")))))
        .as("__dup"),
      (size(col("__arr")) > maxPoints).as("__over"),
      foldArr(col("__arr"), lit(null), lit(null), rateNum, rateDen, burst)
        .as("__out"))
    def guarded(out: org.apache.spark.sql.Column) =
      when(col("__over"), raise_error(concat(
        lit("tokenBucket: key '"), col(keyCol).cast("string"),
        lit(s"' exceeds $maxPoints events — raise maxPoints deliberately")))
        .cast("long"))
        .when(col("__dup"), raise_error(concat(
          lit("tokenBucket: duplicate id within key '"),
          col(keyCol).cast("string"), lit("' — ids must totally order " +
            "same-tick events"))).cast("long"))
        .otherwise(out)
    folded.select(col(keyCol), col("__dup"), col("__over"),
        explode(col("__out")).as("__e"))
      .select(col(keyCol), guarded(col("__e.id")).as("id"),
        guarded(col("__e.i")).as("idx"),
        (guarded(when(col("__e.adm"), 1L).otherwise(0L)) === 1L)
          .as("admitted"),
        guarded(col("__e.lvl")).as("level_q"))
  }

  /** The shared per-event fold over a sorted (i, id) array — the native
    * codegen'd [[graft.functions.TokenBucketFold]]. NULL `seedI` starts
    * a fresh full bucket (the batch-replay entry); non-NULL seeds
    * continue from the streaming store's (last index, level) high-water
    * ([[graft.streaming.BucketIngest]]).
    */
  private[graft] def foldArr(arr: org.apache.spark.sql.Column,
                             seedI: org.apache.spark.sql.Column,
                             seedLvl: org.apache.spark.sql.Column,
                             rateNum: Long, rateDen: Long,
                             burst: Long): org.apache.spark.sql.Column =
    graft.functions.TokenBucketFold(arr, seedI.cast("long"),
      seedLvl.cast("long"), rateNum, rateDen, burst)

  /** Per-key verdict rollup: (keyCol, n_events, n_rejected,
    * first_rejected_id) — the "who would the limit hit" summary.
    */
  def summary(df: DataFrame, keyCol: String, idxCol: String, idCol: String,
              rateNum: Long, rateDen: Long, burst: Long,
              maxPoints: Long = 100000L, preCheck: Boolean = true): DataFrame =
    replay(df, keyCol, idxCol, idCol, rateNum, rateDen, burst, maxPoints,
      preCheck)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("admitted"), 0L).otherwise(1L)).as("n_rejected"),
        // FIRST in (idx, id) replay order, not the smallest id (r10
        // review fix — ids need not be monotone with idx)
        min(when(!col("admitted"), struct(col("idx"), col("id"))))
          .getField("id").as("first_rejected_id"))

  /** DuckDB replay — the same fold via list_reduce; `eventsSql` yields
    * (grp, i, id).
    */
  def replayOracle(eventsSql: String, keyName: String, rateNum: Long,
                   rateDen: Long, burst: Long): String = {
    val cap = burst * rateDen
    val pre = s"least($cap, acc[len(acc)].lvl + " +
      s"(e[1].i - acc[len(acc)].i) * $rateNum)"
    s"""WITH arr AS (
  SELECT grp, list({'i': i, 'id': id} ORDER BY i, id) AS a
  FROM ($eventsSql) WHERE i IS NOT NULL AND id IS NOT NULL GROUP BY grp),
pre AS (
  SELECT grp, list_transform(a, e -> [{'id': e.id, 'i': e.i,
    'adm': $cap >= $rateDen,
    'lvl': $cap - CASE WHEN $cap >= $rateDen THEN $rateDen ELSE 0 END}]) AS a
  FROM arr),
f AS (
  SELECT grp, list_reduce(a, (acc, e) -> list_append(acc, {
    'id': e[1].id, 'i': e[1].i,
    'adm': $pre >= $rateDen,
    'lvl': $pre - CASE WHEN $pre >= $rateDen THEN $rateDen ELSE 0 END})) AS r
  FROM pre)
SELECT grp AS $keyName, u.id AS id, u.i AS idx, u.adm AS admitted,
  CAST(u.lvl AS BIGINT) AS level_q
FROM (SELECT grp, unnest(r) AS u FROM f)
ORDER BY $keyName, idx, id"""
  }

  def summaryOracle(eventsSql: String, keyName: String, rateNum: Long,
                    rateDen: Long, burst: Long): String =
    s"""SELECT $keyName, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(*) FILTER (WHERE NOT admitted) AS BIGINT) AS n_rejected,
  (min(CASE WHEN NOT admitted THEN {'i': idx, 'id': id} END)).id
    AS first_rejected_id
FROM (${replayOracle(eventsSql, keyName, rateNum, rateDen, burst)})
GROUP BY $keyName ORDER BY $keyName"""
}
