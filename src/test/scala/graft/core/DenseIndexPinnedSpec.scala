package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Regression pin for the range-exchange replay bug: RangePartitioner
  * seeds its boundary sampling from the RDD id, so two independent
  * evaluations of the same `repartitionByRange` draw DIFFERENT
  * boundaries whenever the exchange holds more than one partition.
  * [[DenseIndex.withDenseIndex]] evaluates its input twice (offsets
  * pass + output pass); over an unpinned range exchange the ranks then
  * silently corrupt — duplicated and dropped positions that showed up
  * as run-to-run NTILE bucket drift. [[DenseIndex.withDenseIndexPinned]]
  * materializes one snapshot both passes read.
  *
  * The test session runs 4 shuffle partitions, so the exchange is
  * multi-partition and the bug class is live; repeated runs guard
  * against the nondeterminism masking a single lucky pass.
  */
class DenseIndexPinnedSpec extends SparkSpec {

  test("pinned dense index over a range exchange: exact rank set, stable") {
    import spark.implicits._
    val n = 20000
    // adversarial value column: heavy ties + skew, so boundary placement
    // genuinely matters
    val df = (1 to n).map(i => ((i * 2654435761L) % 97, i.toLong))
      .toDF("v", "id")
    (1 to 5).foreach { _ =>
      val sorted = df.repartitionByRange(col("v"), col("id"))
        .sortWithinPartitions("v", "id")
      val ranked = DenseIndex.withDenseIndexPinned(sorted, "__rank")
      val ranks = ranked.select("__rank").as[Long].collect().sorted
      assert(ranks.toSeq == (0L until n).toSeq) // dense, unique, complete
    }
  }

  test("ntileExact bucket sizes follow the NTILE rule at every repetition") {
    import spark.implicits._
    val n = 10007 // prime: uneven buckets exercise the widened-bucket rule
    val k = 10
    val df = (1 to n).map(i => ((i * 7919L) % 1009, i.toLong)).toDF("v", "id")
    val expected = (0 until k)
      .map(b => (b + 1).toLong -> (n / k + (if (b < n % k) 1 else 0)).toLong)
      .toMap
    (1 to 5).foreach { _ =>
      val got = graft.operators.QuantileBuckets.ntileExact(df, "v", "id", k)
        .groupBy("bucket").count()
        .as[(Long, Long)].collect().toMap
      assert(got == expected)
    }
  }
}
