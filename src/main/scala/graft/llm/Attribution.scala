package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style touch attribution over an event stream: for every
  * conversion event, the FIRST and LAST touchpoint (non-conversion event)
  * in the closed lookback interval `[conv_ts − lookback, conv_ts]` of the
  * same user. The training-data angle is label construction: "which
  * exposure preceded the outcome" labels for uplift/recommendation
  * models, built deterministically so regenerated labels never drift.
  *
  * Determinism: touches are ordered by the total (ts, event_id) key, so
  * first/last are unique even under timestamp ties; both engines compare
  * the same (µs, id) integer pairs.
  *
  * Scale shape: ONE hash exchange on the user + a spill-backed per-key
  * sort (the sessionized posture); first/last are conditional min/max
  * STRUCT aggregates over a RANGE frame — running frame state, not a
  * buffered event list, so a whale user costs wall-clock only. No
  * self-join of events against events (the naive interval-join form
  * shuffles the stream twice and fans out per conversion).
  */
object Attribution {

  /** One row per conversion event: (event_id, user_id, ts, first_touch_id,
    * first_touch_type, last_touch_id, last_touch_type) — NULL touch
    * columns when the lookback window holds no touchpoint.
    */
  def firstLastTouch(events: DataFrame, conversionType: String,
                     lookback: String = "2 hours",
                     userCol: String = "user_id", tsCol: String = "ts",
                     typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    val lookbackMicros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(lookback))
    require(lookbackMicros.months == 0 && lookbackMicros.days == 0,
      s"lookback must be a sub-day interval (got '$lookback'): month/day arithmetic " +
        "is calendar-dependent and the RANGE frame works in exact microseconds")
    require(lookbackMicros.microseconds > 0,
      s"lookback must be positive, got '$lookback'")
    // micros measured in NTZ space (timestampdiff over TIMESTAMP_NTZ), not
    // unix_micros(cast to TIMESTAMP): the instant cast rebases through the
    // session timezone, which is NONLINEAR under DST — lookback membership
    // would shift by an hour around transitions and diverge from the
    // oracle's raw-timestamp comparison. Instant inputs are first made NTZ
    // under the session zone (identity under the UTC sessions Verify/Bench
    // pin).
    val micros = expr(
      s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', " +
        s"CAST($tsCol AS TIMESTAMP_NTZ))")
    val w = Window.partitionBy(col(userCol)).orderBy(micros)
      .rangeBetween(-lookbackMicros.microseconds, 0)
    val touch = when(col(typeCol) =!= conversionType,
      struct(micros.as("m"), col(idCol).cast("long").as("i"), col(typeCol).as("t")))
    events
      // NULL users: a window partition would group them TOGETHER (NULL is
      // one partition key) while the oracle's equi-join matches nothing —
      // an unattributable stream is dropped on both sides
      .where(col(userCol).isNotNull)
      .withColumn("__first", min(touch).over(w))
      .withColumn("__last", max(touch).over(w))
      .where(col(typeCol) === conversionType)
      .select(col(idCol).cast("long").as("conversion_id"), col(userCol), col(tsCol),
        col("__first.i").as("first_touch_id"), col("__first.t").as("first_touch_type"),
        col("__last.i").as("last_touch_id"), col("__last.t").as("last_touch_type"))
  }

  /** DuckDB replay — the interval-join form (the oracle can afford the
    * fan-out): touches ranked inside each conversion's window by the same
    * (ts, id) total order, rank 1 = first, rank N = last.
    */
  def oracleSql(table: String, conversionType: String, lookbackSql: String = "INTERVAL 2 HOUR",
                userCol: String = "user_id", tsCol: String = "ts",
                typeCol: String = "event_type", idCol: String = "event_id"): String =
    s"""WITH conv AS (SELECT $idCol AS conversion_id, $userCol, $tsCol
  FROM $table WHERE $typeCol = '$conversionType' AND $userCol IS NOT NULL),
t AS (SELECT c.conversion_id, e.$idCol AS tid, e.$typeCol AS ttype,
    row_number() OVER (PARTITION BY c.conversion_id ORDER BY e.$tsCol, e.$idCol) AS rn,
    count(*) OVER (PARTITION BY c.conversion_id) AS n
  FROM conv c JOIN $table e
    ON e.$userCol = c.$userCol AND e.$typeCol <> '$conversionType'
    AND e.$tsCol >= c.$tsCol - $lookbackSql AND e.$tsCol <= c.$tsCol)
SELECT c.conversion_id, c.$userCol, c.$tsCol,
  f.tid AS first_touch_id, f.ttype AS first_touch_type,
  l.tid AS last_touch_id, l.ttype AS last_touch_type
FROM conv c
LEFT JOIN t f ON f.conversion_id = c.conversion_id AND f.rn = 1
LEFT JOIN t l ON l.conversion_id = c.conversion_id AND l.rn = l.n
ORDER BY c.conversion_id""".stripMargin

  /** U-shaped (position-based) multi-touch attribution — every touch in
    * the conversion's closed lookback window gets credit, split by the
    * standard 40/20/40 rule in exact basis points: first and last touch
    * 4000 bp each, the middle touches sharing 2000 bp by truncating
    * division (`2000 div (n−2)` — the remainder is DROPPED, the honest
    * cross-engine form; credits per conversion sum to ≤ 10000 with the
    * shortfall < n−2 bp). One touch takes all 10000; two touches split
    * 5000/5000. Positions use the same total (ts, id) order as
    * [[firstLastTouch]]; conversions with no in-window touch are absent
    * (nothing to credit).
    *
    * Scale shape: the touch×conversion pairing is the honest output and
    * rides [[graft.operators.RangeJoin.intervalJoin]] — grid-cell
    * bucketed equi-join on (user, cell), never an inequality nested
    * loop; ranking windows partition by CONVERSION (state bounded by
    * that conversion's in-window touches).
    */
  def uShapedCredit(events: DataFrame, conversionType: String,
                    lookback: String = "2 hours",
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type",
                    idCol: String = "event_id"): DataFrame = {
    // NULL ids are unrankable (the position tiebreak) and drop — a
    // NULL-id touch would take rank 1 on Spark and rank n on DuckDB
    val base = events.where(col(userCol).isNotNull && col(idCol).isNotNull)
    val convs = base.where(col(typeCol) === conversionType)
      .select(col(userCol).as("__cu"), col(idCol).cast("long").as("conversion_id"),
        col(tsCol).as("__cts"))
      .withColumn("__cstart", col("__cts") - expr(s"INTERVAL $lookback"))
    val touches = base.where(col(typeCol) =!= conversionType)
      .select(col(userCol).as("__tu"), col(idCol).cast("long").as("touch_id"),
        col(typeCol).as("touch_type"), col(tsCol).as("__tts"))
    val pairs = graft.operators.RangeJoin.intervalJoin(
      touches, convs, "__tts", "__cstart", "__cts",
      on = Seq("__tu" -> "__cu"), bucket = lookback, halfOpen = false)
    val ord = Window.partitionBy(col("conversion_id"))
      .orderBy(col("__tts"), col("touch_id"))
    val whole = Window.partitionBy(col("conversion_id"))
    pairs
      .withColumn("__rk", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(whole))
      .select(col("conversion_id"), col("touch_id"), col("touch_type"),
        expr("""CAST(CASE WHEN __n = 1 THEN 10000
          WHEN __rk = 1 OR __rk = __n THEN CASE WHEN __n = 2 THEN 5000 ELSE 4000 END
          ELSE 2000 div (__n - 2) END AS BIGINT)""").as("credit_bp"))
  }

  /** DuckDB replay of [[uShapedCredit]] — plain inequality join (oracle
    * scale affords the fan-out), same rank positions and credit CASE.
    */
  def uShapedOracle(table: String, conversionType: String,
                    lookbackSql: String = "INTERVAL 2 HOUR",
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type",
                    idCol: String = "event_id"): String =
    s"""WITH conv AS (SELECT $idCol AS conversion_id, $userCol, $tsCol
  FROM $table WHERE $typeCol = '$conversionType' AND $userCol IS NOT NULL
    AND $idCol IS NOT NULL),
p AS (SELECT c.conversion_id, e.$idCol AS touch_id, e.$typeCol AS touch_type,
    row_number() OVER (PARTITION BY c.conversion_id ORDER BY e.$tsCol, e.$idCol) AS rk,
    count(*) OVER (PARTITION BY c.conversion_id) AS n
  FROM conv c JOIN $table e
    ON e.$userCol = c.$userCol AND e.$typeCol <> '$conversionType'
    AND e.$idCol IS NOT NULL
    AND e.$tsCol >= c.$tsCol - $lookbackSql AND e.$tsCol <= c.$tsCol)
SELECT conversion_id, CAST(touch_id AS BIGINT) AS touch_id, touch_type,
  CAST(CASE WHEN n = 1 THEN 10000
    WHEN rk = 1 OR rk = n THEN CASE WHEN n = 2 THEN 5000 ELSE 4000 END
    ELSE 2000 // (n - 2) END AS BIGINT) AS credit_bp
FROM p ORDER BY conversion_id, touch_id""".stripMargin

  /** Time-decay credit — the third attribution scheme beside
    * [[firstLastTouch]] (positional) and [[uShapedCredit]] (positional
    * blend): recency is the signal, each touch's weight HALVES per
    * `halflife` elapsed before the conversion. Float 2^(−Δ/h) never
    * replays, so the decay is DECLARED step-wise: k = Δ div halflife
    * (capped at 62 — beyond that the weight is one 2⁻⁶² sliver of the
    * newest touch's), weight = 2^(62−k) exact powers of two, and
    * `credit_bp = ⌊10⁴·w/Σw⌋` one truncating division per touch with the
    * weight sum in DECIMAL(38,0) (10⁴ touches × 2⁶² cannot overflow).
    * Same pairing, same windows, same NULL contracts as
    * [[uShapedCredit]]; `decay_steps` (= k) is published so a reader can
    * audit the step function directly.
    */
  def timeDecayCredit(events: DataFrame, conversionType: String,
                      lookback: String = "2 hours",
                      halflife: String = "30 minutes",
                      userCol: String = "user_id", tsCol: String = "ts",
                      typeCol: String = "event_type",
                      idCol: String = "event_id"): DataFrame = {
    val hl = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(halflife))
    require(hl.months == 0 && hl.days == 0 && hl.microseconds > 0,
      s"halflife must be a positive sub-day interval, got '$halflife'")
    val base = events.where(col(userCol).isNotNull && col(idCol).isNotNull)
    val convs = base.where(col(typeCol) === conversionType)
      .select(col(userCol).as("__cu"), col(idCol).cast("long").as("conversion_id"),
        col(tsCol).as("__cts"))
      .withColumn("__cstart", col("__cts") - expr(s"INTERVAL $lookback"))
    val touches = base.where(col(typeCol) =!= conversionType)
      .select(col(userCol).as("__tu"), col(idCol).cast("long").as("touch_id"),
        col(typeCol).as("touch_type"), col(tsCol).as("__tts"))
    val pairs = graft.operators.RangeJoin.intervalJoin(
      touches, convs, "__tts", "__cstart", "__cts",
      on = Seq("__tu" -> "__cu"), bucket = lookback, halfOpen = false)
    val dec = "decimal(38,0)"
    val whole = Window.partitionBy(col("conversion_id"))
    pairs
      .withColumn("decay_steps", least(
        call_function("div",
          expr("timestampdiff(MICROSECOND, CAST(__tts AS TIMESTAMP_NTZ), " +
            "CAST(__cts AS TIMESTAMP_NTZ))"),
          lit(hl.microseconds)), lit(62L))
        .cast("long"))
      .withColumn("__w",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(62 - decay_steps AS INT))"))
      .withColumn("__sw", sum(col("__w").cast(dec)).over(whole).cast(dec))
      .select(col("conversion_id"), col("touch_id"), col("touch_type"),
        col("decay_steps"),
        call_function("div",
          (lit(10000L).cast(dec) * col("__w").cast(dec)).cast(dec),
          col("__sw")).cast("long").as("credit_bp"))
  }

  /** DuckDB replay of [[timeDecayCredit]] — plain inequality join, same
    * step function via BIGINT shifts, HUGEINT weight sum.
    */
  def timeDecayOracle(table: String, conversionType: String,
                      lookbackSql: String = "INTERVAL 2 HOUR",
                      halflifeMicros: Long = 1800000000L,
                      userCol: String = "user_id", tsCol: String = "ts",
                      typeCol: String = "event_type",
                      idCol: String = "event_id"): String =
    s"""WITH conv AS (SELECT $idCol AS conversion_id, $userCol, $tsCol
  FROM $table WHERE $typeCol = '$conversionType' AND $userCol IS NOT NULL
    AND $idCol IS NOT NULL),
p AS (SELECT c.conversion_id, e.$idCol AS touch_id, e.$typeCol AS touch_type,
    least(date_diff('microsecond', e.$tsCol, c.$tsCol) // $halflifeMicros,
      62) AS k
  FROM conv c JOIN $table e
    ON e.$userCol = c.$userCol AND e.$typeCol <> '$conversionType'
    AND e.$idCol IS NOT NULL
    AND e.$tsCol >= c.$tsCol - $lookbackSql AND e.$tsCol <= c.$tsCol),
w AS (SELECT conversion_id, touch_id, touch_type, k,
    CAST(1 AS BIGINT) << CAST(62 - k AS INT) AS wt FROM p),
sw AS (SELECT conversion_id, sum(CAST(wt AS HUGEINT)) AS s
  FROM w GROUP BY conversion_id)
SELECT w.conversion_id, CAST(w.touch_id AS BIGINT) AS touch_id, w.touch_type,
  CAST(w.k AS BIGINT) AS decay_steps,
  CAST((10000 * CAST(w.wt AS HUGEINT)) // sw.s AS BIGINT) AS credit_bp
FROM w JOIN sw ON w.conversion_id = sw.conversion_id
ORDER BY w.conversion_id, w.touch_id"""
}
