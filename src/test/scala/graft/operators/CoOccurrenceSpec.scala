package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-occurrence contracts: per-basket pair counting, quantity never
  * inflates, whale-basket exclusion + audit, threshold, plan shape.
  */
class CoOccurrenceSpec extends SparkSpec {

  import spark.implicits._

  private val baskets = Seq(
    (1L, "milk"), (1L, "bread"), (1L, "eggs"),
    (2L, "milk"), (2L, "bread"),
    (3L, "milk"), (3L, "bread"),
    (4L, "eggs"), (4L, "beer"),
    (5L, "milk"), (5L, "milk"), (5L, "bread") // duplicate item in basket
  ).toDF("order_id", "item")

  test("hand-checked pair counts with canonical ordering") {
    val got = CoOccurrence.pairs(baskets, "order_id", "item", minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("bread", "milk")) == 4L) // baskets 1,2,3,5
    assert(got(("bread", "eggs")) == 1L && got(("eggs", "milk")) == 1L)
    assert(got(("beer", "eggs")) == 1L)
    assert(!got.keySet.exists { case (a, b) => a >= b })
  }

  test("minCount thresholds; duplicate items never inflate counts") {
    val got = CoOccurrence.pairs(baskets, "order_id", "item", minCount = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("bread", "milk") -> 4L)) // 5's double milk counts once
  }

  test("whale baskets are excluded and reported") {
    val whale = (1L to 50L).map(i => (99L, s"item$i")).toDF("order_id", "item")
    val df = baskets.unionByName(whale)
    val got = CoOccurrence.pairs(df, "order_id", "item", minCount = 1, maxBasket = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!got.exists { case (a, b) => a.startsWith("item") || b.startsWith("item") })
    val audit = CoOccurrence.oversizedBaskets(df, "order_id", "item", maxBasket = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audit == Map(99L -> 50L))
  }

  test("plan: basket-keyed equi-join, no cartesian; distinct partial-agg'd") {
    val plan = CoOccurrence.pairs(baskets, "order_id", "item", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
