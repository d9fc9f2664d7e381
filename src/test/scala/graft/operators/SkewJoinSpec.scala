package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join must equal the plain join on any input (salting only
  * re-partitions work), and must actually spread a hot key over buckets.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of key=1 (the whale) + a sprinkle of other keys
  private lazy val big = spark.range(10000).select(lit(1L).as("k"), col("id").as("payload"))
    .unionByName(spark.range(2, 50).select(col("id").as("k"), (col("id") * 10).as("payload")))
  private lazy val small = Seq((1L, "hot"), (2L, "warm"), (99L, "unmatched")).toDF("sk", "name")

  test("salted inner join equals plain inner join") {
    val plain = big.join(small, big("k") === small("sk")).select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(big, small, "k", "sk", buckets = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted left join preserves unmatched big-side rows") {
    val salted = SkewJoin.saltedJoin(big, small, "k", "sk", buckets = 4, joinType = "left")
    assert(salted.count() == big.count())
    assert(salted.where(col("name").isNull).count() == big.where(!col("k").isin(1L, 2L)).count())
  }

  test("the hot key spreads across multiple salt buckets") {
    val salt = (rand(42L) * 8).cast("int")
    val spread = big.where(col("k") === 1L).withColumn("s", salt)
      .groupBy("s").count().count()
    assert(spread >= 6, s"only $spread buckets used") // 10k draws over 8 buckets
  }
}
