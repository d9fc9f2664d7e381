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

  test("cosine: hand-checked squared-cosine units and threshold") {
    // b1{x,y} b2{x,y} b3{x,z} b4{y}: n_x=3, n_y=3, n_z=1
    val d = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"), (4L, "y")).toDF("b", "i")
    val all = CoOccurrence.cosineNeighbors(d, "b", "i", minCount = 1,
      minSim2E8 = 0).orderBy("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // cos²(x,y) = 4/9 → 44444444; cos²(x,z) = 1/3 → 33333333
    assert(all.toSeq == Seq(("x", "y", 2L, 3L, 3L, 44444444L),
      ("x", "z", 1L, 3L, 1L, 33333333L)))
    val cut = CoOccurrence.cosineNeighbors(d, "b", "i", 1, 40000000L)
      .collect()
    assert(cut.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "y")))
  }

  test("cosine: supports count qualified baskets only (never exceeds 1.0)") {
    // a whale basket {x,y,z} is excluded from pairs AND supports — a
    // mixed universe would let sim² exceed 1e8
    val d = Seq((1L, "x"), (1L, "y"), (9L, "x"), (9L, "y"), (9L, "z"))
      .toDF("b", "i")
    val got = CoOccurrence.cosineNeighbors(d, "b", "i", 1, 0, maxBasket = 2)
      .collect()
    assert(got.length == 1)
    // only b1 qualifies: n_x = n_y = 1, co = 1 → sim² = 1e8 exactly
    assert((got(0).getLong(2), got(0).getLong(3), got(0).getLong(4),
      got(0).getLong(5)) == ((1L, 1L, 1L, 100000000L)))
  }

  test("rules: hand-checked support/confidence/lift in 1e-8 units") {
    // x in all 4 baskets, y in 2 (always with x), z in 1 (with x): N=4
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"), (4L, "x")).toDF("b", "i")
    val got = CoOccurrence.rules(df, "b", "i", minCount = 1, minConfE8 = 0)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // x→y: conf 2/4, support 2/4, lift 2·4/(4·2) = 1 (independent)
    assert(got(("x", "y")) == ((2L, 4L, 2L, 50000000L, 50000000L, 100000000L)))
    // y→x: conf 1 — y never appears without x
    assert(got(("y", "x")) == ((2L, 2L, 4L, 50000000L, 100000000L, 100000000L)))
    // x→z truncates: conf 1/4, support 1/4
    assert(got(("x", "z")) == ((1L, 4L, 1L, 25000000L, 25000000L, 100000000L)))
    assert(got(("z", "x"))._5 == 100000000L)
    // the confidence cut keeps only the certain rules
    val cut = CoOccurrence.rules(df, "b", "i", minCount = 1,
        minConfE8 = 100000000L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cut == Set(("y", "x"), ("z", "x")))
  }

  test("frequent triples prune losslessly (A-priori downward closure)") {
    import spark.implicits._
    // baskets: {1,2,3} x3, {1,2,4} x2, {1,3,4} x1
    val rows = Seq.fill(3)(Seq(1L, 2L, 3L)) ++ Seq.fill(2)(Seq(1L, 2L, 4L)) ++
      Seq(Seq(1L, 3L, 4L))
    val df = rows.zipWithIndex.flatMap { case (items, b) =>
      items.map(i => (b.toLong, i)) }.toDF("bk", "item")
    val got = CoOccurrence.triples(df, "bk", "item", minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    assert(got == Map((1L, 2L, 3L) -> 3L, (1L, 2L, 4L) -> 2L))
  }

  test("triples respect the maxBasket whale exclusion") {
    import spark.implicits._
    val whale = (1L to 10L).map(i => (99L, i))
    val ok = Seq.fill(2)(Seq(1L, 2L, 3L)).zipWithIndex.flatMap {
      case (items, b) => items.map(i => (b.toLong, i)) }
    val df = (ok ++ whale).toDF("bk", "item")
    val got = CoOccurrence.triples(df, "bk", "item", minCount = 2,
      maxBasket = 5).collect()
    assert(got.length == 1 && got.head.getLong(3) == 2L)
  }
}
