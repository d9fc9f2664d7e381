package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Salted equi-join for skewed keys. AQE's skew-join handles most cases at
  * runtime; salting is the explicit tool when one key dominates so heavily
  * that even split shuffle blocks serialize onto few tasks (the classic
  * "null-key / whale-customer" shape at 100 TB).
  *
  * Mechanics: the skewed (big) side gets a uniform random salt in
  * [0, buckets); the other side is replicated `buckets` times with every
  * salt value; the join key becomes (key, salt) — fanning one hot key's
  * rows over `buckets` tasks. Correctness: each big-side row matches
  * exactly the one replica carrying its salt, so the join multiset is
  * unchanged. Cost: the replicated side shuffles `buckets`× — use only
  * when the replicated side is small relative to the skew win.
  */
object SkewJoin {

  /** Inner/left equi-join of `big` (skewed) with `small` on `bigKey ===
    * smallKey`, salted over `buckets`. `joinType` supports "inner" and
    * "left_outer" (the salt preserves unmatched big-side rows).
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported salted join type $joinType")
    val salt = "__salt"
    // content-derived salt (hash of the row's hashable columns): any
    // distribution works for correctness — uniformity only affects
    // balance — but a hash is deterministic under AQE re-sharding and
    // stage retries where rand(seed) is partition-layout-dependent.
    // CAVEAT (the price of determinism): rows that are BYTE-IDENTICAL
    // share a bucket, so a whale key whose rows are all duplicates of
    // one row still lands on one task — but identical-row whales are
    // better collapsed upstream (count + re-expand, or distinct) than
    // salted; a whale key's DISTINCT rows fan out as intended. MapType
    // columns are unhashable (HASH_MAP_TYPE) and are excluded from the
    // salt input — the remaining columns still discriminate rows unless
    // rows differ ONLY in map columns.
    val hashable = big.schema.fields.collect {
      case f if !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] =>
        col(f.name)
    }.toIndexedSeq
    require(hashable.nonEmpty,
      "saltedJoin: every column is a MapType — no hashable salt input")
    val bigSalted = big.withColumn(salt,
      pmod(xxhash64(hashable: _*), lit(buckets)).cast(IntegerType))
    val smallExploded = small.withColumn(salt, explode(sequence(lit(0), lit(buckets - 1))))
    val cond: Column =
      bigSalted(bigKey) === smallExploded(smallKey) && bigSalted(salt) === smallExploded(salt)
    bigSalted.join(smallExploded, cond, joinType)
      .drop(bigSalted(salt)).drop(smallExploded(salt))
  }
}
