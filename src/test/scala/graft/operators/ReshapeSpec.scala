package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reshape contracts: pivot ≡ conditional aggregation, absent-value
  * columns, round trip with unpivot, and the no-Expand pivot plan.
  */
class ReshapeSpec extends SparkSpec {

  private def salesDf = {
    import spark.implicits._
    Seq(
      ("east", "A", 1L), ("east", "A", 2L), ("east", "B", 5L),
      ("west", "B", 7L), ("west", "C", 11L)
    ).toDF("region", "cat", "amt")
  }

  test("pivot equals hand-written conditional aggregation") {
    val out = Reshape.pivotAgg(salesDf, Seq("region"), "cat",
        Seq("A", "B", "C"), Seq(sum(col("amt"))))
      .collect().map(r => (r.getString(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSet
    assert(out == Set(
      ("east", Some(3L), Some(5L), None),
      ("west", None, Some(7L), Some(11L))))
  }

  test("pinned values not present in the data still yield columns") {
    val cols = Reshape.pivotAgg(salesDf, Seq("region"), "cat",
      Seq("A", "Z"), Seq(sum(col("amt")))).columns.toSeq
    assert(cols == Seq("region", "A", "Z"))
  }

  test("unpivot stacks measures; pivot(unpivot) round-trips") {
    val long = Reshape.unpivot(salesDf.groupBy("region", "cat")
        .agg(sum("amt").as("s"), count(lit(1)).as("n")),
      Seq("region", "cat"), Seq("s", "n"))
    assert(long.columns.toSeq == Seq("region", "cat", "metric", "value"))
    assert(long.count() == 8)
    val back = Reshape.pivotAgg(long.where(col("metric") === "s"),
        Seq("region", "cat"), "metric", Seq("s"), Seq(sum(col("value"))))
      .withColumnRenamed("s", "v")
    val direct = salesDf.groupBy("region", "cat").agg(sum("amt").as("v"))
    assert(back.collect().toSet == direct.collect().toSet)
  }

  test("plan: pivot is one partial-agg'd group-by, no Expand, no shuffle extra") {
    val plan = Reshape.pivotAgg(salesDf, Seq("region"), "cat",
      Seq("A", "B", "C"), Seq(sum(col("amt")))).queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("Expand"), plan)
  }

  test("empty group/value/agg lists are rejected") {
    intercept[IllegalArgumentException](
      Reshape.pivotAgg(salesDf, Seq(), "cat", Seq("A"), Seq(sum(col("amt")))))
    intercept[IllegalArgumentException](
      Reshape.pivotAgg(salesDf, Seq("region"), "cat", Seq(), Seq(sum(col("amt")))))
    intercept[IllegalArgumentException](Reshape.unpivot(salesDf, Seq("region"), Seq()))
  }
}
