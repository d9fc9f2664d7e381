package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: exact in the low-cardinality regime, MG
  * guarantees (presence of true heavy hitters, bounded undercount) on
  * adversarial streams, partitioning independence of the guarantees.
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime (distinct <= k) equals GROUP BY count, any partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val expected = docs.groupBy("lang").count()
      .orderBy(col("count").desc, col("lang").asc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    for (parts <- Seq(1, 7)) {
      val got = FreqItems.topItems(docs.repartition(parts), col("lang"), k = 32, top = 10)
        .orderBy("rank")
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("per-group relational form matches the window formulation exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = FreqItems.perGroup(docs, Seq("source"), col("lang"), k = 32, top = 2)
      .orderBy("source", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("cnt").desc, col("lang").asc)
    val expected = docs.groupBy("source", "lang").agg(count("*").as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 2)
      .orderBy("source", "rank")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("MG guarantees on an adversarial high-cardinality stream") {
    // one heavy item at ~20% of the stream, the rest all-distinct noise:
    // cardinality (~8k) >> k (15), so decrements fire constantly
    val n = 10000
    val heavy = (1 to (n / 5)).map(_ => "HEAVY")
    val noise = (1 to n - n / 5).map(i => s"noise_$i")
    val df = (heavy ++ noise).toDF("item").repartition(8)
    val k = 15
    val got = FreqItems.topItems(df, col("item"), k = k, top = k)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    // true count > n/(k+1) = 625 < 2000 ⇒ HEAVY must be present
    assert(got.contains("HEAVY"), s"heavy hitter missing from $got")
    // counts never overcount and undercount by at most n/(k+1)
    assert(got("HEAVY") <= n / 5)
    assert(got("HEAVY") >= n / 5 - n / (k + 1),
      s"undercount too large: ${got("HEAVY")}")
    // MG never overcounts: a noise item's true count is 1
    got.foreach { case (i, c) =>
      if (i != "HEAVY") assert(c <= 1L, s"$i overcounted: $c")
    }
  }

  test("99%-one-group skew: partial agg bounds state, results stay exact") {
    // the SCALING.md claim: grouped heavy hitters on a whale group column
    // are skew-safe BY CONSTRUCTION — 99% of rows in one group still reduce
    // to one ≤k summary per (group, partition) before the exchange
    val n = 200000
    val df = spark.range(0, n).select(
      when(col("id") % 100 =!= 0, lit("whale")).otherwise(concat(lit("g"), col("id") % 7)).as("grp"),
      concat(lit("item"), col("id") % 11).as("item"))
    // plan pin: the map-side partial pass is present (the summary, not the
    // raw rows, crosses the exchange)
    val q = FreqItems.perGroup(df, Seq("grp"), col("item"), k = 32, top = 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("partial_freqsketch"), s"expected partial_freqsketch in:\n$plan")
    // distinct items (11) << k (32): the exact regime, so the skewed group's
    // counts must equal GROUP BY exactly, under any partitioning
    val expected = df.groupBy("grp", "item").agg(count("*").as("cnt"))
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy(col("cnt").desc, col("item").asc)).cast("long"))
      .where(col("rank") <= 3).orderBy("grp", "rank")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getString(1), r.getLong(2))).toSeq
    for (parts <- Seq(4, 32)) {
      val got = FreqItems.perGroup(df.repartition(parts), Seq("grp"), col("item"), k = 32, top = 3)
        .orderBy("grp", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("null items are ignored") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("item")
    val got = FreqItems.topItems(df, col("item"), k = 8, top = 8)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
  }
}
