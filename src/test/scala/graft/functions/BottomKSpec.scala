package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bottom-k aggregator: equals the window formulation (the semantics
  * oracle), independent of partitioning (the mergeability contract), and
  * keeps duplicate values (multiset, not distinct).
  */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(99L)
  private lazy val data = Seq.tabulate(5000)(i =>
    (i % 7, rnd.nextInt(200).toLong)).toDF("g", "v")

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(BottomK(k)(col("v")).as("sk"))
      .select(col("g"), posexplode(col("sk")).as(Seq("pos", "v")))
      .select("g", "pos", "v")
      .as[(Int, Int, Long)].collect().toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("v")))
      .where(col("rn") <= k)
      .select(col("g"), (col("rn") - 1).as("pos"), col("v"))
      .as[(Int, Int, Long)].collect().toSet
  }

  test("equals the window bottom-k formulation (incl. duplicates)") {
    assert(viaAgg(data, 16) === viaWindow(data, 16))
  }

  test("partitioning-independent (merge correctness)") {
    assert(viaAgg(data.repartition(1), 8) === viaAgg(data.repartition(13), 8))
  }

  test("groups smaller than k return all members sorted") {
    val tiny = Seq((1, 5L), (1, 3L), (2, 9L)).toDF("g", "v")
    val got = tiny.groupBy("g").agg(BottomK(10)(col("v")).as("sk"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) === Seq(3L, 5L) && got(2) === Seq(9L))
  }

  test("plan shows partial aggregation below (upstream of) the exchange") {
    val plan = data.groupBy("g").agg(BottomK(4)(col("v")).as("sk"))
      .queryExecution.executedPlan.toString
    // plans print top-down (final agg, then Exchange, then partial agg);
    // the map-side partial pass is the Aggregate BELOW the exchange — its
    // absence (shuffle carries every row) is the regression guarded here
    val ei = plan.indexOf("Exchange")
    assert(ei >= 0, s"no exchange:\n$plan")
    assert(plan.lastIndexOf("Aggregate") > ei,
      s"no partial aggregate upstream of the exchange:\n$plan")
  }
}
