package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  private lazy val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")

  test("perGroup equals the row_number window formulation") {
    val agg = TopK.perGroup(lineitem, Seq("l_returnflag"),
        col("l_extendedprice"), col("l_orderkey") * 10 + col("l_linenumber"), k = 5)
      .orderBy("l_returnflag", "rank")
    val id = (col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
    val w = Window.partitionBy("l_returnflag").orderBy(col("s").desc, col("i").asc)
    val win = lineitem
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("s"), id.as("i"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("l_returnflag"), col("rank").cast("long"), col("i").as("id"), col("s").as("score"))
      .orderBy("l_returnflag", "rank")
    assert(agg.collect().toSeq === win.collect().toSeq)
  }

  test("result is partitioning-independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      TopK.perGroup(df, Seq("l_linestatus"), col("l_quantity"), col("l_orderkey"), k = 4)
        .orderBy("l_linestatus", "rank").collect().toSeq
    assert(run(lineitem.repartition(1)) === run(lineitem.repartition(13)))
  }

  test("ties break to the lowest id (deterministic cross-engine order)") {
    import spark.implicits._
    val df = Seq(("g", 1.0, 7L), ("g", 1.0, 3L), ("g", 1.0, 5L), ("g", 2.0, 9L))
      .toDF("g", "s", "i")
    val got = TopK.perGroup(df, Seq("g"), col("s"), col("i"), k = 3)
      .orderBy("rank").select("id").as[Long].collect()
    assert(got.toSeq === Seq(9L, 3L, 5L))
  }

  test("groups smaller than k emit all their rows") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("b", 2.0, 2L), ("b", 1.0, 3L)).toDF("g", "s", "i")
    val got = TopK.perGroup(df, Seq("g"), col("s"), col("i"), k = 10)
      .orderBy("g", "rank").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("a", "b", "b"))
  }

  test("plan shows partial aggregation (map-side ≤k reduction before the exchange)") {
    val plan = TopK.perGroup(lineitem, Seq("l_returnflag"),
      col("l_extendedprice"), col("l_orderkey"), k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkbyscore"), s"expected partial_topkbyscore in:\n$plan")
  }
}
