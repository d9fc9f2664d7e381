package graft.llm

import graft.SparkSpec

/** Markov attribution: hand 2-channel absorption walk, removal knocks,
  * truncation-at-conversion, channel-count guard.
  */
class MarkovAttributionSpec extends SparkSpec {

  import spark.implicits._

  // u1: a -> conv; u2: a -> b -> (end); u3: b -> conv
  private def events = Seq(
    (1L, 1L, "a"), (1L, 2L, "conv"),
    (2L, 1L, "a"), (2L, 2L, "b"),
    (3L, 1L, "b"), (3L, 2L, "conv"))
    .toDF("user_id", "event_id", "event_type")
    .withColumn("ts", org.apache.spark.sql.functions.col("event_id"))

  test("transition counts truncate at first conversion") {
    val tr = MarkovAttribution.conversionTransitions(
        events, "user_id", "ts", "event_type", "event_id", "conv")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n"))).toSet
    assert(tr == Set(("__START", "a", 2L), ("__START", "b", 1L),
      ("a", "conv", 1L), ("a", "b", 1L), ("b", "__END", 1L),
      ("b", "conv", 1L)))
  }

  test("hand 3-round walk: base and both removal effects") {
    val got = MarkovAttribution.removalEffects(
        events, "user_id", "ts", "event_type", "event_id",
        convType = "conv", rounds = 3)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getAs[Long]("p_base_q6"),
        r.getAs[Long]("p_removed_q6")))
    // base: p3(START) = (2*750000 + 500000) div 3 = 666666
    // remove a: only b->conv survives two hops from START: 166666
    // remove b: a->conv at half weight: 333333
    assert(got.toSeq == Seq(("a", 666666L, 166666L),
      ("b", 666666L, 333333L)))
  }

  test("a user converting on the first event contributes START->conv only") {
    val df = Seq((1L, 1L, "conv"), (1L, 2L, "a"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts", org.apache.spark.sql.functions.col("event_id"))
    val tr = MarkovAttribution.conversionTransitions(
        df, "user_id", "ts", "event_type", "event_id", "conv")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(tr == Set(("__START", "conv")))
  }

  test("rounds bounds and reserved-sentinel collisions enforced") {
    intercept[IllegalArgumentException] {
      MarkovAttribution.removalEffects(events, convType = "conv", rounds = 0)
    }
    intercept[IllegalArgumentException] {
      MarkovAttribution.removalEffects(events, convType = "__END", rounds = 2)
    }
    val clash = Seq((1L, 1L, "__BASE"), (1L, 2L, "conv"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts", org.apache.spark.sql.functions.col("event_id"))
    val e = intercept[IllegalArgumentException] {
      MarkovAttribution.removalEffects(clash, convType = "conv", rounds = 2)
    }
    assert(e.getMessage.contains("reserved"))
  }
}
