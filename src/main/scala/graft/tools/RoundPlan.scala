package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump one GraphRank ROUND's physical plan in the no-broadcast
  * (at-scale) regime — the gate-level explain only shows the final
  * orderBy over the last checkpoint, so the per-round shape (the thing
  * the pinned edge layout changes) needs its own dump.
  * `runMain graft.tools.RoundPlan <sfDir> [pinned|unpinned]`
  */
object RoundPlan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "pinned"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("round-plan")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val fwd = li.select(col("l_partkey").as("src"),
      (col("l_suppkey") + 100000000L).as("dst")).distinct()
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(false)
    val n = spark.sessionState.conf.numShufflePartitions
    val (eDeg, nodes) =
      if (mode == "pinned") (
        graft.operators.GraphRank.pinnedLayout(_
          .withColumn("__outdeg", count(lit(1))
            .over(org.apache.spark.sql.expressions.Window.partitionBy("src"))))(
          e, "src", n),
        graft.operators.GraphRank.pinnedLayout(_.distinct())(
          e.select(col("src").as("id")).union(e.select(col("dst").as("id"))),
          "id", n))
      else (
        e.join(e.groupBy("src").agg(count(lit(1)).as("__outdeg")), "src")
          .localCheckpoint(false),
        e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct().localCheckpoint(false))
    val scores = nodes.select(col("id"), lit(1000000L).as("score"))
    graft.operators.GraphRank.step(eDeg, nodes, scores, 150000L, 85L, 100L)
      .explain("formatted")
    spark.stop()
  }
}
