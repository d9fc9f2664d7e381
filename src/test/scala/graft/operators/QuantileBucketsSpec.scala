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
    // shrink AQE's coalescing targets for this test so the range exchange
    // genuinely holds >1 partition at test scale (AQE would otherwise
    // coalesce the tiny shuffle to one partition and the layout assertion
    // below would be vacuous — the same masking that hid the replay bug)
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val minKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val prevAdvisory = spark.conf.get(advisoryKey)
    val prevMin = spark.conf.get(minKey)
    spark.conf.set(advisoryKey, "1k")
    spark.conf.set(minKey, "1k")
    val (out, spans) = try {
      val o = QuantileBuckets.ntileExact(df, "v", "id", 10)
      val sp = o.select("v", "id").rdd
        .glom().collect()
        .map(_.map(r => (r.getLong(0), r.getLong(1))))
        .filter(_.nonEmpty)
        .map(p => (p.min, p.max))
      (o, sp)
    } finally {
      spark.conf.set(advisoryKey, prevAdvisory)
      spark.conf.set(minKey, prevMin)
    }
    val plan = out.queryExecution.executedPlan.toString
    // the range exchange now lives INSIDE the pinned snapshot's RDD
    // lineage (withDenseIndexPinned checkpoints the sorted frame so both
    // DenseIndex passes read one layout — the replay-determinism fix),
    // so the outer plan shows the snapshot scan, not the exchange. Assert
    // the operator's OWN data actually came through a multi-partition
    // range layout: the output (a broadcast join over the snapshot
    // preserves its partitioning) must hold >1 non-empty partition whose
    // (v, id) spans are disjoint and ordered — the observable signature
    // of range partitioning, on the pinned frame itself rather than on a
    // freshly built lookalike.
    assert(spans.length > 1)
    assert(spans.sliding(2).forall {
      case Array((_, hiA), (loB, _)) =>
        hiA._1 < loB._1 || (hiA._1 == loB._1 && hiA._2 <= loB._2)
      case _ => true
    })
    assert(plan.contains("ExistingRDD") || plan.contains("LogicalRDD"))
    // the only Window in the plan is DenseIndex's numPartitions-row offset
    // cumsum — NTILE itself is arithmetic, not a window function
    assert(!plan.contains("ntile"))
  }
}
