package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FirstKSpec extends SparkSpec {

  test("equals the array_sort + slice formulation it replaces") {
    import spark.implicits._
    val df = Seq(
      ("u1", 300L, 1L, "c"), ("u1", 100L, 1L, "a"), ("u1", 200L, 1L, "b"),
      ("u1", 400L, 2L, "d"), ("u1", 500L, 3L, "e"),
      ("u2", 50L, 9L, "x")
    ).toDF("g", "t", "i", "e")
    val agg = df.groupBy("g")
      .agg(FirstK(3)(col("t"), col("i"), col("e")).as("seq"))
      .select(col("g"), transform(col("seq"), s => s.getField("_3")).as("es"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    val ref = df.groupBy("g")
      .agg(slice(array_sort(collect_list(struct(col("t"), col("i"), col("e")))), 1, 3).as("seq"))
      .select(col("g"), transform(col("seq"), s => s.getField("e")).as("es"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    assert(agg === ref)
    assert(agg.head._2 === Seq("a", "b", "c"))
  }

  test("duplicate (t, id) keys tie-break on payload; null payload first") {
    import spark.implicits._
    val df = Seq(
      ("g", 1L, 1L, "b"), ("g", 1L, 1L, null.asInstanceOf[String]), ("g", 1L, 1L, "a")
    ).toDF("g", "t", "i", "e")
    val got = df.groupBy("g")
      .agg(FirstK(2)(col("t"), col("i"), col("e")).as("seq"))
      .select(transform(col("seq"), s => s.getField("_3")))
      .head.getSeq[String](0)
    assert(got === Seq(null, "a"))
  }

  test("result is partitioning-independent") {
    import spark.implicits._
    val df = spark.range(0, 5000)
      .select((col("id") % 7).as("g"), (col("id") * 37 % 5000).as("t"),
        col("id").as("i"), concat(lit("e"), col("id") % 11).as("e"))
    def run(p: Int) = df.repartition(p).groupBy("g")
      .agg(FirstK(5)(col("t"), col("i"), col("e")).as("seq"))
      .orderBy("g").collect().map(_.toString).toSeq
    assert(run(1) === run(13))
  }

  test("plan shows partial aggregation (map-side ≤k reduction before the exchange)") {
    import spark.implicits._
    val df = Seq(("g", 1L, 1L, "a")).toDF("g", "t", "i", "e")
    val plan = df.groupBy("g").agg(FirstK(3)(col("t"), col("i"), col("e")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_firstkbykey"), s"expected partial_firstkbykey in:\n$plan")
  }
}
