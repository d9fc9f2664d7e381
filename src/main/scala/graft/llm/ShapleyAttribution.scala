package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Shapley attribution over observed touch coalitions — the
  * game-theoretic member of the attribution family (L231 U-shape and
  * L151 time-decay are POSITION-based conventions; L278 Markov is a
  * model's removal effect; Shapley is the unique credit satisfying
  * efficiency/symmetry/dummy/additivity axioms): with the standard
  * data-driven characteristic function v(S) = conversions of users
  * whose touch set is CONTAINED in S, the game decomposes into
  * unanimity games — one per observed coalition T with weight c_T —
  * and the Shapley value collapses to the closed form
  *
  *   φ_channel = Σ_{T ∋ channel} c_T / |T|
  *
  * (each converting user's credit splits EQUALLY among the distinct
  * channels they touched; the equal split is not a convention here,
  * it is the THEOREM). Exactness: credits publish in 1/L units with
  * L = lcm(1..maxCoalition), so every per-user share L/|T| is an
  * exact integer and the sums hash-gate — no per-term floor needed.
  *
  * Semantics: a user converts at their FIRST `conversionType` event;
  * their coalition is the set of DISTINCT channel types strictly
  * before it (the conversion itself is never a channel); converters
  * who touched nothing credit the declared `directLabel` (the "walked
  * in the door" bucket — dropping them would silently deflate
  * efficiency: Σφ = conversions, spec-pinned). Coalitions larger than
  * `maxCoalition` raise in-plan (L outgrows Long past ~lcm(1..42)).
  *
  * Scale shape: one (user)-keyed partial-agg'd min for conversion
  * times, one distinct (user, channel) collapse, a set-size count and
  * the exploded per-channel sum — all 8-byte-key shuffles; no windows,
  * no joins beyond the user-keyed enrich.
  */
object ShapleyAttribution {

  /** lcm(1..n) — the exact-share denominator. */
  private[llm] def lcmUpTo(n: Int): Long = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1L to n.toLong).foldLeft(1L)((acc, k) => acc / gcd(acc, k) * k)
  }

  /** (channel, n_users, credit_l, scale_l): credit in 1/scale_l
    * conversions; Σ credit_l = converters × scale_l exactly.
    */
  def shapley(events: DataFrame, userCol: String, typeCol: String,
              tsCol: String, conversionType: String,
              directLabel: String = "(direct)",
              maxCoalition: Int = 12): DataFrame = {
    require(maxCoalition >= 1 && maxCoalition <= 40,
      s"maxCoalition must be in [1, 40], got $maxCoalition")
    val L = lcmUpTo(maxCoalition)
    val t = unix_micros(col(tsCol).cast("timestamp"))
    val base = events
      .where(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).cast("string").as("__c"),
        t.as("__t"))
    val conv = base.where(col("__c") === conversionType)
      .groupBy(col("__u")).agg(min(col("__t")).as("__ct"))
    val touches = base.where(col("__c") =!= conversionType)
      .join(conv.withColumnRenamed("__u", "__cu"),
        col("__u") <=> col("__cu") && col("__t") < col("__ct"))
      .select(col("__u"), col("__c")).distinct()
    val sized = touches.groupBy(col("__u").as("__su"))
      .agg(count(lit(1)).as("__m"))
    val withSize = touches.join(sized, col("__u") <=> col("__su"))
      .select(col("__u"), col("__c"),
        when(col("__m") > maxCoalition,
          raise_error(concat(lit("shapley: coalition of "),
            col("__m").cast("string"),
            lit(s" channels exceeds maxCoalition=$maxCoalition — raise it " +
              "deliberately (the exact-share denominator grows as lcm)")))
            .cast("long"))
          .otherwise(col("__m")).as("__m"))
    val credited = withSize
      .select(col("__c"),
        call_function("div", lit(L), col("__m")).as("__share"))
    // converters with an empty coalition: the declared direct bucket
    val direct = conv.join(sized, col("__u") <=> col("__su"), "left_anti")
      .select(lit(directLabel).as("__c"), lit(L).as("__share"))
    credited.unionByName(direct)
      .groupBy(col("__c").as("channel"))
      .agg(count(lit(1)).as("n_users"), sum(col("__share")).as("credit_l"))
      .withColumn("scale_l", lit(L))
  }

  /** DuckDB replay; `eventsSql` yields (u, c, t_us). */
  def oracleSql(eventsSql: String, conversionType: String,
                directLabel: String = "(direct)",
                maxCoalition: Int = 12): String = {
    val L = lcmUpTo(maxCoalition)
    s"""WITH base AS (SELECT u, c, t_us FROM ($eventsSql)
  WHERE u IS NOT NULL AND c IS NOT NULL AND t_us IS NOT NULL),
conv AS (SELECT u, min(t_us) AS ct FROM base
  WHERE c = '$conversionType' GROUP BY u),
touches AS (SELECT DISTINCT b.u, b.c FROM base b JOIN conv ON b.u = conv.u
  WHERE b.c <> '$conversionType' AND b.t_us < conv.ct),
sized AS (SELECT u, count(*) AS m FROM touches GROUP BY u),
credited AS (SELECT t.c, $L // s.m AS share
  FROM touches t JOIN sized s ON t.u = s.u),
direct AS (SELECT '$directLabel' AS c, $L AS share FROM conv
  WHERE u NOT IN (SELECT u FROM sized))
SELECT c AS channel, CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(share) AS BIGINT) AS credit_l, CAST($L AS BIGINT) AS scale_l
FROM (SELECT * FROM credited UNION ALL SELECT * FROM direct)
GROUP BY c ORDER BY c"""
  }
}
