package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FIFO lot matching: hand allocations, bucket-width independence,
  * conservation identities, unfilled remainder, guard raises.
  */
class FifoMatchSpec extends SparkSpec {

  import spark.implicits._

  private def lots3 = Seq(("g", 1L, 10L), ("g", 2L, 5L)).toDF("k", "i", "q")
  private def demands3 = Seq(("g", 1L, 4L), ("g", 2L, 8L), ("g", 3L, 6L))
    .toDF("k", "i", "q")

  test("hand case: allocations are cumulative-interval overlaps") {
    // lots [0,10),[10,15); demands [0,4),[4,12),[12,18)
    val got = FifoMatch.allocate(lots3, demands3, "k", "i", "q",
        bucketMass = 4L)
      .orderBy("lot_idx", "demand_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 4L), (1L, 2L, 6L), (2L, 2L, 2L),
      (2L, 3L, 3L)))
  }

  test("bucket width never changes the result (exactly-once cell claim)") {
    val expected = FifoMatch.allocate(lots3, demands3, "k", "i", "q",
      bucketMass = 1L).orderBy("lot_idx", "demand_idx")
      .collect().map(_.toSeq).toSeq
    for (w <- Seq(2L, 3L, 7L, 100L)) {
      val got = FifoMatch.allocate(lots3, demands3, "k", "i", "q",
        bucketMass = w).orderBy("lot_idx", "demand_idx")
        .collect().map(_.toSeq).toSeq
      assert(got == expected, s"bucketMass=$w")
    }
  }

  test("conservation: every demand is filled up to supply; lots never over-allocate") {
    // deterministic multi-key mix
    val lots = (1L to 40L).map(i => (s"k${i % 4}", i, (i * 7 % 13) + 1))
      .toDF("k", "i", "q")
    val demands = (1L to 50L).map(i => (s"k${i % 5}", i, (i * 5 % 11) + 1))
      .toDF("k", "i", "q")
    val alloc = FifoMatch.allocate(lots, demands, "k", "i", "q", bucketMass = 8L)
    // per-lot totals <= lot qty
    val overLot = alloc.groupBy("k", "lot_idx").agg(sum("qty").as("a"))
      .join(lots.select(col("k"), col("i").as("lot_idx"), col("q")),
        Seq("k", "lot_idx"))
      .where(col("a") > col("q")).count()
    assert(overLot == 0L)
    // per-demand: allocated + unfilled == demanded
    val unf = FifoMatch.unfilledDemand(lots, demands, "k", "i", "q")
      .select(col("k"), col("demand_idx"), col("qty_unfilled"))
    val perDemand = alloc.groupBy("k", "demand_idx").agg(sum("qty").as("a"))
      .join(demands.select(col("k"), col("i").as("demand_idx"), col("q")),
        Seq("k", "demand_idx"), "right")
      .join(unf, Seq("k", "demand_idx"), "left")
      .select(col("q"),
        (coalesce(col("a"), lit(0L)) + coalesce(col("qty_unfilled"), lit(0L)))
          .as("covered"))
    assert(perDemand.where(col("q") =!= col("covered")).count() == 0L)
    // demands on a key with no lots at all (k4: lots are keyed i % 4)
    // are fully unfilled
    assert(unf.where(col("k") === "k4").count() ==
      demands.where(col("k") === "k4").count())
  }

  test("unfilled remainder: partial fill reports only the uncovered tail") {
    val got = FifoMatch.unfilledDemand(lots3, demands3, "k", "i", "q")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((3L, 6L, 3L))) // demand 3 wanted 6, got 3
  }

  test("guards: non-positive qty, duplicate idx, oversized interval all raise") {
    val badQ = Seq(("g", 1L, 0L)).toDF("k", "i", "q")
    val e1 = intercept[Exception] {
      FifoMatch.allocate(badQ, demands3, "k", "i", "q").collect()
    }
    assert(e1.getMessage.contains("non-positive quantity"))
    val dup = Seq(("g", 1L, 2L), ("g", 1L, 3L)).toDF("k", "i", "q")
    val e2 = intercept[Exception] {
      FifoMatch.allocate(dup, demands3, "k", "i", "q").collect()
    }
    assert(e2.getMessage.contains("duplicate idx"))
    val wide = Seq(("g", 1L, 1000000L)).toDF("k", "i", "q")
    val e3 = intercept[Exception] {
      FifoMatch.allocate(wide, demands3, "k", "i", "q",
        bucketMass = 2L, maxCellsPerRow = 16L).collect()
    }
    assert(e3.getMessage.contains("covers more than 16 cells"))
  }

  test("NULL key/idx/qty rows drop; keys never cross-match") {
    val lots = Seq((Some("a"), Some(1L), Some(5L)),
      (Option.empty[String], Some(2L), Some(5L)),
      (Some("b"), None, Some(5L))).toDF("k", "i", "q")
    val demands = Seq((Some("a"), Some(1L), Some(3L)),
      (Some("b"), Some(1L), Some(3L))).toDF("k", "i", "q")
    val got = FifoMatch.allocate(lots, demands, "k", "i", "q")
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 3L)))
  }

  test("plan: the pairing is a hash equi-join — no cartesian, no nested loop") {
    val plan = FifoMatch.allocate(lots3, demands3, "k", "i", "q")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("remaining lots: the ageing mirror — allocated + remaining == lot qty") {
    // lots [0,10),[10,15); demand total 18 > supply 15 -> nothing remains
    assert(FifoMatch.remainingLots(lots3, demands3, "k", "i", "q").count() == 0L)
    // smaller demand: total 6 -> lot1 keeps 4, lot2 keeps 5
    val d = Seq(("g", 1L, 6L)).toDF("k", "i", "q")
    val got = FifoMatch.remainingLots(lots3, d, "k", "i", "q")
      .orderBy("lot_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 10L, 4L), (2L, 5L, 5L)))
    // no demand at all: every lot fully remains
    val none = Seq.empty[(String, Long, Long)].toDF("k", "i", "q")
    val all = FifoMatch.remainingLots(lots3, none, "k", "i", "q")
      .orderBy("lot_idx").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(all.toSeq == Seq((1L, 10L), (2L, 5L)))
  }
}
