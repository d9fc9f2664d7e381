package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Impossible-travel detection — the account-takeover signal every
  * fraud/abuse pipeline runs: consecutive events of the same user whose
  * implied speed exceeds a physical bound. Exact integer end-to-end:
  * coordinates are PLANAR INTEGERS (the [[SpatialJoin]] contract — the
  * caller owns the projection) and the speed test cross-multiplies
  * instead of dividing —
  *
  *   flag ⟺ dist² · vDen² > vNum² · Δt²    (speed > vNum/vDen units/µs)
  *
  * so no float ever enters the plan (a float division at the threshold
  * is exactly where two engines disagree). Simultaneous events
  * (Δt = 0) at different coordinates are flagged (teleportation);
  * same-coordinate Δt = 0 pairs are not (dist² = 0 ⇏ 0 > 0).
  *
  * Scale shape: ONE lag window over the per-user (ts, id) order — the
  * sessionized posture, state is one previous row; flagged pairs are
  * violation-sized. NULL user/ts/coordinate rows drop (an unlocatable
  * event can't witness travel); NULL users would otherwise pool into
  * one pseudo-user and fabricate violations.
  */
object Travel {

  /** (user, prev_id, event_id, dist2, dt_us) for every consecutive pair
    * exceeding the bound.
    */
  def impossible(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, xCol: String, yCol: String,
                 vNum: Long, vDen: Long): DataFrame = {
    require(vNum >= 1 && vDen >= 1,
      s"speed bound $vNum/$vDen must be a positive rational")
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col("user")).orderBy(col("__us"), col("event_id"))
    events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull && col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(userCol).as("user"), col(idCol).as("event_id"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .withColumn("__px", lag(col("__x"), 1).over(w))
      .withColumn("__py", lag(col("__y"), 1).over(w))
      .withColumn("__pus", lag(col("__us"), 1).over(w))
      .where(col("prev_id").isNotNull)
      .withColumn("dist2",
        expr(s"CAST(__x - __px AS $dec) * (__x - __px) + " +
          s"CAST(__y - __py AS $dec) * (__y - __py)"))
      .withColumn("dt_us", col("__us") - col("__pus"))
      .where(expr(s"dist2 * ${vDen}L * $vDen > " +
        s"CAST($vNum AS $dec) * $vNum * dt_us * dt_us"))
      .select(col("user"), col("prev_id"), col("event_id"),
        col("dist2").cast("long").as("dist2"), col("dt_us"))
  }

  /** DuckDB replay of [[impossible]]. */
  def oracleSql(table: String, userCol: String, tsCol: String,
                idCol: String, xSql: String, ySql: String,
                vNum: Long, vDen: Long): String =
    s"""WITH m AS (
  SELECT $userCol AS u, $idCol AS i, epoch_us($tsCol) AS us,
    CAST($xSql AS BIGINT) AS x, CAST($ySql AS BIGINT) AS y
  FROM $table
  WHERE $userCol IS NOT NULL AND $tsCol IS NOT NULL AND $idCol IS NOT NULL
    AND ($xSql) IS NOT NULL AND ($ySql) IS NOT NULL),
p AS (SELECT u, i, us, x, y,
    lag(i) OVER w AS pi, lag(us) OVER w AS pus,
    lag(x) OVER w AS px, lag(y) OVER w AS py
  FROM m WINDOW w AS (PARTITION BY u ORDER BY us, i)),
f AS (SELECT u, pi, i,
    CAST(x - px AS HUGEINT) * (x - px) + CAST(y - py AS HUGEINT) * (y - py) AS d2,
    us - pus AS dt
  FROM p WHERE pi IS NOT NULL)
SELECT u AS user, pi AS prev_id, i AS event_id,
  CAST(d2 AS BIGINT) AS dist2, CAST(dt AS BIGINT) AS dt_us
FROM f
WHERE d2 * $vDen * $vDen > CAST($vNum AS HUGEINT) * $vNum * dt * dt
ORDER BY user, event_id""".stripMargin
}
