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

  test("scoreLinear equals the brute-force hashed dot product") {
    val dim = 16
    val w = Array.tabulate(dim)(b => (b * 7L) - 50L)
    val got = FeatureHash.scoreLinear(docs, "id", "text", w)
      .as[(Long, Long)].collect().toMap
    val brute = docs.select($"id", $"text").as[(Long, String)].collect().flatMap {
      case (id, text) =>
        val toks = text.split(" ", -1).filter(_.nonEmpty)
        if (toks.isEmpty) None
        else Some(id -> toks.map(t =>
          w((graft.functions.Md5Prefix60.hash60(
            org.apache.spark.unsafe.types.UTF8String.fromString(t)) % dim).toInt)).sum)
    }.toMap
    assert(got === brute)
  }

  test("scoreLinear: empty documents produce no score row") {
    val w = Array.fill(8)(1L)
    val ids = FeatureHash.scoreLinear(docs, "id", "text", w)
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 4L)) // doc 3 is empty
  }

  test("scoreLinear with all-ones weights returns the token count") {
    val w = Array.fill(32)(1L)
    val got = FeatureHash.scoreLinear(docs, "id", "text", w)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 6L, 2L -> 3L, 4L -> 1L))
  }

  test("plan: partial aggregation before the exchange") {
    val plan = FeatureHash.featurize(docs, "id", "text", 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"))
  }
}
