package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank contracts: exact replay of a local integer recurrence,
  * partitioning independence (the cross-engine determinism claim), mass
  * behavior, and the per-round plan shape.
  */
class GraphRankSpec extends SparkSpec {

  import spark.implicits._

  // a small directed graph with a hub (4), a chain, and a dangling sink (5)
  private val edgeList = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), // cycle
    (1L, 4L), (2L, 4L), (3L, 4L), // hub in-links
    (4L, 5L))                     // 5 is dangling (no out-edges)
  private def edges = edgeList.toDF("src", "dst")

  /** Local replay of the exact integer recurrence. */
  private def localRank(iters: Int, start: Long = 1000000L,
                        num: Long = 85, den: Long = 100): Map[Long, Long] = {
    val nodes = edgeList.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edgeList.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = start * (den - num) / den
    var sc = nodes.map(_ -> start).toMap
    (1 to iters).foreach { _ =>
      val in = edgeList
        .map { case (s, d) => d -> sc(s) / outdeg(s) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      sc = nodes.map(n => n -> (base + num * in.getOrElse(n, 0L) / den)).toMap
    }
    sc
  }

  private def run(iters: Int): Map[Long, Long] =
    GraphRank.pageRankInt(edges, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the exact integer recurrence, round by round") {
    Seq(0, 1, 3, 5).foreach { k => assert(run(k) == localRank(k), s"iters=$k") }
  }

  test("result is independent of input partitioning") {
    val a = GraphRank.pageRankInt(edges.repartition(7), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphRank.pageRankInt(edges.repartition(1), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("the hub outranks cycle members; the dangling sink still accumulates") {
    val sc = run(5)
    val cycle = Seq(1L, 2L, 3L).map(sc)
    assert(cycle.forall(sc(4L) > _), s"hub must outrank the cycle: $sc")
    assert(sc(5L) > 0, "dangling sink keeps receiving")
  }

  test("iters=0 returns startScore for every vertex") {
    assert(run(0).values.toSet == Set(1000000L))
  }

  test("each round's incoming sum is a partial aggregate; no cartesian anywhere") {
    val e = edges
    val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("__outdeg")), "src")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val scores = nodes.select(col("id"), lit(1000000L).as("score"))
    val plan = GraphRank.step(eDeg, nodes, scores, 150000L, 85L, 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("pinned edge layout: a round reshuffles only vertex-sized frames") {
    // replicate pageRankInt's pinned-layout setup and plan one round in
    // the no-broadcast (at-scale) regime: the checkpointed hash(src)
    // layout must survive into the LogicalRDD so the contribution join
    // does NOT re-exchange the edge list — only the incoming-sum
    // aggregate moves edge-volume data
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val n = spark.sessionState.conf.numShufflePartitions
      val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(false)
      def pinned(df: org.apache.spark.sql.DataFrame, key: String) =
        GraphRank.pinnedLayout()(df, key, n)
      val eDegRaw = e.join(e.groupBy("src").agg(count(lit(1)).as("__outdeg")), "src")
      val nodesRaw = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      def exchanges(eDeg: org.apache.spark.sql.DataFrame,
                    nodes: org.apache.spark.sql.DataFrame): Int = {
        val scores = nodes.select(col("id"), lit(1000000L).as("score"))
        val plan = GraphRank.step(eDeg, nodes, scores, 150000L, 85L, 100L)
          .queryExecution.executedPlan.toString
        "Exchange hashpartitioning".r.findAllIn(plan).length
      }
      val unpinnedCount = exchanges(eDegRaw.localCheckpoint(false),
        nodesRaw.localCheckpoint(false))
      val pinnedCount = exchanges(pinned(eDegRaw, "src"), pinned(nodesRaw, "id"))
      assert(pinnedCount < unpinnedCount,
        s"pinned=$pinnedCount unpinned=$unpinnedCount")
      assert(pinnedCount <= 2, s"pinned round still re-exchanges: $pinnedCount")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("invalid damping or iteration counts are rejected") {
    intercept[IllegalArgumentException](GraphRank.pageRankInt(edges, -1))
    intercept[IllegalArgumentException](GraphRank.pageRankInt(edges, 1, dampNum = 101))
  }

  test("personalized: mass stays in the seed's component, hand recurrence") {
    import spark.implicits._
    // two disjoint 2-cycles; seed only vertex 1
    val e = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("seed")
    val got2 = GraphRank.personalizedPageRankInt(e, seeds, "seed", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // s1: (1)->150000, (2)->850000; s2: (1)->150000+722500, (2)->127500
    assert(got2 == Map(1L -> 872500L, 2L -> 127500L, 3L -> 0L, 4L -> 0L))
  }

  test("personalized: a seed outside the graph fails loudly") {
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      GraphRank.personalizedPageRankInt(e, Seq(99L).toDF("seed"), "seed", 1)
    }
  }
}
