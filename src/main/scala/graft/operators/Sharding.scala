package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — stable key→shard
  * routing: `pmod(hash, n)` reshuffles (n−1)/n of ALL keys when a
  * shard is added; rendezvous hashing moves exactly the keys whose
  * winner changed — 1/(n+1) in expectation — which is what keeps
  * caches, stores and sticky sessions warm through a topology change.
  * Each key picks argmax over shards of h(key, shard), as ONE
  * scan-stage expression: the shard list is a literal array, the
  * argmax an `array_max` over (hash, shard) structs — zero shuffle,
  * zero state, md5-60 replayable cross-engine, ties (2⁻⁶⁰-improbable
  * but defined) break by shard name via the struct ordering.
  *
  * [[movedShare]] is the topology-change audit: the exact moved-key
  * share between two shard lists — the number that justifies the
  * operator (expect ≈ added/(n+m), never a full reshuffle).
  *
  * NULL keys route to a NULL shard (kept, not dropped — routing loses
  * no rows); shard names must be distinct and non-empty.
  */
object Sharding {

  val Scale = 1000000L

  private def pick(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty, "shards must not be empty")
    require(shards.distinct.size == shards.size, "shard names must be distinct")
    require(shards.forall(_.nonEmpty), "shard names must be non-empty")
    val arr = array(shards.map(lit): _*)
    array_max(transform(arr, s => struct(
      graft.text.TextFunctions.hash60(
        concat(key.cast("string"), lit("|"), s)).as("h"),
      s.as("s")))).getField("s")
  }

  /** `df` plus `outCol` = the key's rendezvous shard. */
  def rendezvous(df: DataFrame, keyCol: String, shards: Seq[String],
                 outCol: String = "shard"): DataFrame =
    df.withColumn(outCol,
      when(col(keyCol).isNotNull, pick(col(keyCol), shards)))

  /** Per-key before/after assignment under two shard lists plus the
    * moved flag — aggregate for the moved share.
    */
  def reshardPlan(df: DataFrame, keyCol: String, shardsBefore: Seq[String],
                  shardsAfter: Seq[String]): DataFrame =
    df.where(col(keyCol).isNotNull)
      .select(col(keyCol),
        pick(col(keyCol), shardsBefore).as("shard_before"),
        pick(col(keyCol), shardsAfter).as("shard_after"))
      .withColumn("moved", col("shard_before") =!= col("shard_after"))

  /** One row: (n_keys, n_moved, moved_q6). */
  def movedShare(df: DataFrame, keyCol: String, shardsBefore: Seq[String],
                 shardsAfter: Seq[String]): DataFrame =
    reshardPlan(df.select(col(keyCol)).distinct(), keyCol,
      shardsBefore, shardsAfter)
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("moved"), 1L).otherwise(0L)).as("n_moved"))
      .select(col("n_keys"), col("n_moved"),
        expr(s"(n_moved * $Scale) div n_keys").as("moved_q6"))

  private def pickSql(keySql: String, shards: Seq[String]): String = {
    val lits = shards.map(s => s"'$s'").mkString(", ")
    s"""list_max(list_transform([$lits], s -> {
      'h': CAST(('0x'||substr(md5(CAST($keySql AS VARCHAR) || '|' || s),1,15)) AS BIGINT),
      's': s})).s"""
  }

  /** DuckDB replay of [[reshardPlan]]. */
  def reshardOracle(table: String, keySql: String, keyName: String,
                    shardsBefore: Seq[String],
                    shardsAfter: Seq[String]): String =
    s"""SELECT $keySql AS $keyName,
  ${pickSql(keySql, shardsBefore)} AS shard_before,
  ${pickSql(keySql, shardsAfter)} AS shard_after,
  ${pickSql(keySql, shardsBefore)} <> ${pickSql(keySql, shardsAfter)}
    AS moved
FROM $table WHERE ($keySql) IS NOT NULL ORDER BY $keyName"""
}
