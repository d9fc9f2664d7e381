package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The point of bucketing is the plan shape: equi-joins and keyed
  * aggregations over co-bucketed tables must run with ZERO shuffle
  * exchanges, and the join result must equal the plain-join result.
  */
class BucketingSpec extends SparkSpec {

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val tables: Unit = {
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // files survive; clear both so Overwrite never hits LOCATION_ALREADY_EXISTS
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft_test_warehouse/$t"))
    }
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), nBuckets = 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", Seq("l_orderkey"), nBuckets = 4)
  }

  test("co-bucketed equi-join plans with zero exchanges and matches the plain join") {
    tables
    withNoBroadcast {
      val joined = Bucketing.readTable(spark, "b_lineitem")
        .join(Bucketing.readTable(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      val plain = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey")
      assert(joined.count() === plain.count())
      assert(joined.except(plain).isEmpty && plain.except(joined).isEmpty)
    }
  }

  test("aggregation on the bucket key plans with zero exchanges") {
    tables
    val agg = Bucketing.readTable(spark, "b_lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed groupBy still shuffles:\n$plan")
    val expect = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    assert(agg.except(expect).isEmpty && expect.except(agg).isEmpty)
  }

  test("path read of the same files loses bucket metadata (contract doc)") {
    tables
    withNoBroadcast {
      val loc = spark.sql("DESCRIBE TABLE EXTENDED b_orders")
        .where(col("col_name") === "Location").select("data_type").head().getString(0)
      val pathRead = spark.read.parquet(loc)
      val joined = pathRead.join(Bucketing.readTable(spark, "b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), "expected the path-read side to shuffle")
    }
  }
}
