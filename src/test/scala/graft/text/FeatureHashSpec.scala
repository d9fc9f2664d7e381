package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashing-trick featurization: mass conservation, bucket range, empty
  * token handling, and partitioning independence.
  */
class FeatureHashSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "cat  cat cat"), // double space → empty token, dropped
    (3L, ""),
    (4L, "unique")).toDF("id", "text")

  test("per-document tf mass equals the non-empty token count") {
    val mass = FeatureHash.featurize(docs, "id", "text", dim = 16)
      .groupBy("id").agg(sum("tf").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(mass(1L) === 6L)
    assert(mass(2L) === 3L) // the empty token between double spaces is dropped
    assert(!mass.contains(3L)) // empty doc: no features
    assert(mass(4L) === 1L)
  }

  test("buckets are in [0, dim)") {
    val buckets = FeatureHash.featurize(docs, "id", "text", dim = 8)
      .select("bucket").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 8))
  }

  test("identical tokens always share a bucket: repeated word is one row") {
    val row = FeatureHash.featurize(docs.where($"id" === 2L), "id", "text", 1024)
      .as[(Long, Long, Long)].collect()
    assert(row.length === 1 && row.head._3 === 3L)
  }

  test("partitioning-independent") {
    val many = (1 to 100).map(i => (i.toLong, s"tok${i % 7} tok${i % 3} shared"))
      .toDF("id", "text")
    val a = FeatureHash.featurize(many.coalesce(1), "id", "text", 32)
      .as[(Long, Long, Long)].collect().toSet
    val b = FeatureHash.featurize(many.repartition(8), "id", "text", 32)
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("plan: partial aggregation before the exchange") {
    val plan = FeatureHash.featurize(docs, "id", "text", 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"))
  }
}
