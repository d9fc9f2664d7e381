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
    // content-derived salt (hash of the full row): any distribution works
    // for correctness — uniformity only affects balance — but a hash is
    // deterministic under AQE re-sharding and stage retries where
    // rand(seed) is partition-layout-dependent. Rows that are fully
    // identical share a bucket; a whale key's DISTINCT rows still fan out
    val bigSalted = big.withColumn(salt,
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets)).cast(IntegerType))
    val smallExploded = small.withColumn(salt, explode(sequence(lit(0), lit(buckets - 1))))
    val cond: Column =
      bigSalted(bigKey) === smallExploded(smallKey) && bigSalted(salt) === smallExploded(salt)
    bigSalted.join(smallExploded, cond, joinType)
      .drop(bigSalted(salt)).drop(smallExploded(salt))
  }
}
