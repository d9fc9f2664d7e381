package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Percentile-rank transform: hand Hazen values with ties, symmetry,
  * NULL row retention, bucketWidth independence vs the window form.
  */
class PercentileRankSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: Hazen percentiles with a tie sharing the average rank") {
    // values 10, 20, 20, 40 (n=4): avgranks 1, 2.5, 2.5, 4
    // pct = (avgrank - 0.5)/4 -> 0.125, 0.5, 0.5, 0.875
    val df = Seq((1L, "g", 10L), (2L, "g", 20L), (3L, "g", 20L),
      (4L, "g", 40L)).toDF("id", "grp", "v")
    val got = PercentileRank.transform(df, Seq("grp"), "v")
      .orderBy("id").collect().map(_.getAs[Long]("pct_q6"))
    assert(got.toSeq == Seq(125000L, 500000L, 500000L, 875000L))
  }

  test("symmetry: pct(v) + pct(-v) spans the full scale exactly") {
    // n = 8 divides the 10^6 scale, so both divisions are exact and the
    // symmetry identity holds with no truncation slack
    val df = (1L to 8L).map(i => (i, "g", i * 3L)).toDF("id", "grp", "v")
    val up = PercentileRank.transform(df, Seq("grp"), "v")
      .orderBy("id").collect().map(_.getAs[Long]("pct_q6"))
    val dn = PercentileRank.transform(
        df.withColumn("v", -col("v")), Seq("grp"), "v")
      .orderBy("id").collect().map(_.getAs[Long]("pct_q6"))
    // distinct values: (r-0.5)/n forward + (n-r+0.5)/n backward = 1
    up.zip(dn).foreach { case (u, d) => assert(u + d == 1000000L) }
  }

  test("NULL values keep their row with NULL pct; NULL group is a stratum") {
    val df = Seq((1L, Some("a"), Some(5L)), (2L, Some("a"), None),
      (3L, Option.empty[String], Some(7L)))
      .toDF("id", "grp", "v")
    val got = PercentileRank.transform(df, Seq("grp"), "v")
      .orderBy("id").collect()
    assert(got.length == 3, "no row may drop")
    assert(got(0).getAs[Long]("pct_q6") == 500000L) // single value: (1-0.5)/1
    assert(got(1).isNullAt(got(1).fieldIndex("pct_q6")))
    assert(got(2).getAs[Long]("pct_q6") == 500000L) // null stratum, single value
  }

  test("bucketWidth independence on real data") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("cents",
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .select("o_orderkey", "o_orderpriority", "cents")
    def run(w: Long) = PercentileRank
      .transform(orders, Seq("o_orderpriority"), "cents", bucketWidth = w)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val base = run(1000000L)
    assert(run(1L) == base)
    assert(run(1000000000000L) == base)
  }
}
