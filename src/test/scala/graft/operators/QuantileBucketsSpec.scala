package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact NTILE vs the window formulation, uneven splits, k > n, and the
  * no-single-partition-window plan contract.
  */
class QuantileBucketsSpec extends SparkSpec {

  import spark.implicits._

  private def windowNtile(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("bucket",
      ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))

  private def check(n: Int, k: Int, parts: Int = 5): Unit = {
    val df = (1 to n).map(i => ((i * 7919L) % 1000, i.toLong))
      .toDF("v", "id").repartition(parts)
    val got = QuantileBuckets.ntileExact(df, "v", "id", k)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val want = windowNtile(df, k)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got === want, s"n=$n k=$k")
  }

  test("equals window NTILE when k divides n") { check(100, 10) }
  test("uneven split: first n mod k buckets are one row larger") { check(103, 10) }
  test("k > n: each row its own bucket, ranks dense from 1") { check(4, 10) }
  test("n = 1") { check(1, 3) }
  test("ties on v: id tiebreak keeps buckets deterministic") {
    val df = (1 to 50).map(i => (7L, i.toLong)).toDF("v", "id")
    val got = QuantileBuckets.ntileExact(df, "v", "id", 7)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val want = windowNtile(df, 7).select("id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("partitioning-independent: same buckets from 1 and 8 input partitions") {
    val base = (1 to 97).map(i => ((i * 104729L) % 500, i.toLong)).toDF("v", "id")
    val a = QuantileBuckets.ntileExact(base.coalesce(1), "v", "id", 8)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val b = QuantileBuckets.ntileExact(base.repartition(8), "v", "id", 8)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("cutpoints (exact regime): ties share a bucket, buckets are monotone in v") {
    val df = (1 to 200).map(i => ((i % 20).toLong, i.toLong)).toDF("v", "id")
    val got = QuantileBuckets.bucketByCutpoints(df, "v", k = 4, sketchK = 512)
      .select("v", "bucket").as[(Long, Long)].collect()
    // ties: every row with the same v has the same bucket
    assert(got.groupBy(_._1).values.forall(_.map(_._2).toSet.size == 1))
    // monotone: larger v never gets a smaller bucket
    val byV = got.toMap
    assert(byV.toSeq.sortBy(_._1).map(_._2) === byV.toSeq.sortBy(_._1).map(_._2).sorted)
    assert(got.map(_._2).toSet.subsetOf((1L to 4L).toSet))
  }

  test("cutpoints (exact regime): distinct uniform values split evenly") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("v", "id")
    val sizes = QuantileBuckets.bucketByCutpoints(df, "v", k = 5, sketchK = 512)
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(sizes === Map(1L -> 20L, 2L -> 20L, 3L -> 20L, 4L -> 20L, 5L -> 20L))
  }

  test("cutpoints: partitioning-independent in the exact regime") {
    val base = (1 to 150).map(i => ((i * 37L) % 61, i.toLong)).toDF("v", "id")
    val a = QuantileBuckets.bucketByCutpoints(base.coalesce(1), "v", 6, 512)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val b = QuantileBuckets.bucketByCutpoints(base.repartition(8), "v", 6, 512)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("cutpoints plan: no repartition of row data — one aggregate + broadcast join") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("v", "id")
    val plan = QuantileBuckets.bucketByCutpoints(df, "v", 4, 512)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("plan: range partitioning, no single-partition window over row data") {
    val df = (1 to 200).map(i => (i.toLong % 37, i.toLong)).toDF("v", "id")
    val out = QuantileBuckets.ntileExact(df, "v", "id", 10)
    val plan = out.queryExecution.executedPlan.toString
    // the range exchange now lives INSIDE the pinned snapshot's RDD
    // lineage (withDenseIndexPinned checkpoints the sorted frame so both
    // DenseIndex passes read one layout — the replay-determinism fix),
    // so the outer plan shows the snapshot scan, not the exchange; the
    // sort itself is pinned on the PRE-checkpoint frame instead
    val sortedPlan = df.repartitionByRange(col("v"), col("id"))
      .sortWithinPartitions("v", "id")
      .queryExecution.executedPlan.toString
    assert(sortedPlan.contains("rangepartitioning"))
    assert(plan.contains("ExistingRDD") || plan.contains("LogicalRDD"))
    // the only Window in the plan is DenseIndex's numPartitions-row offset
    // cumsum — NTILE itself is arithmetic, not a window function
    assert(!plan.contains("ntile"))
  }
}
