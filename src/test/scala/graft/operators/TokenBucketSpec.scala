package graft.operators

import graft.SparkSpec

/** Token bucket: hand-traced drain/refill, same-tick burst order,
  * rejection non-consumption, capacity clamp, summary rollup, raises.
  */
class TokenBucketSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long)*) = // (idx, id)
    rows.map { case (i, id) => ("k", i, id) }.toDF("key", "i", "id")

  test("hand-traced drain and refill at 1 token per 10 ticks, burst 2") {
    // cap=20, cost=10. t0: full 20 -> admit, 10. t2: +2=12 -> admit, 2.
    // t5: +3=5 -> REJECT (keeps 5). t19: +14=19 -> admit, 9.
    val got = TokenBucket.replay(ev((0L, 1L), (2L, 2L), (5L, 3L), (19L, 4L)),
        "key", "i", "id", rateNum = 1, rateDen = 10, burst = 2)
      .orderBy("idx").collect()
      .map(r => (r.getBoolean(3), r.getLong(4)))
    assert(got.toSeq == Seq((true, 10L), (true, 2L), (false, 5L), (true, 9L)))
  }

  test("a same-tick burst drains in id order; overflow rejects") {
    // burst 2, rate 1/10: three events at tick 0 -> two admitted, third not
    val got = TokenBucket.replay(ev((0L, 7L), (0L, 8L), (0L, 9L)),
        "key", "i", "id", 1, 10, 2)
      .orderBy("id").collect().map(_.getBoolean(3))
    assert(got.toSeq == Seq(true, true, false))
  }

  test("rejections do not consume: a rejected event leaves the level") {
    // rate 1/100 burst 1: admit at 0 (level 0), reject at 50 (level 50),
    // admit at 100 (level 50+50=100 >= 100 -> 0)
    val got = TokenBucket.replay(ev((0L, 1L), (50L, 2L), (100L, 3L)),
        "key", "i", "id", 1, 100, 1)
      .orderBy("idx").collect().map(r => (r.getBoolean(3), r.getLong(4)))
    assert(got.toSeq == Seq((true, 0L), (false, 50L), (true, 0L)))
  }

  test("refill clamps at capacity") {
    // a huge gap cannot store more than burst tokens
    val got = TokenBucket.replay(ev((0L, 1L), (1000000L, 2L), (1000001L, 3L),
        (1000002L, 4L), (1000003L, 5L)),
        "key", "i", "id", 1, 10, 2)
      .orderBy("idx").collect().map(_.getBoolean(3))
    // after the gap: capped at 2 tokens -> admits 2, then rejects
    assert(got.toSeq == Seq(true, true, true, false, false))
  }

  test("summary: rollup counts and the first rejected id") {
    val df = ev((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val r = TokenBucket.summary(df, "key", "i", "id", 1, 10, 2).head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L && r.getLong(3) == 3L)
  }

  test("duplicate ids and whale keys raise; NULL strata and drops") {
    val dup = ev((0L, 1L), (1L, 1L))
    val e1 = intercept[Exception] {
      TokenBucket.replay(dup, "key", "i", "id", 1, 10, 2).collect() }
    assert(e1.getMessage.contains("duplicate id"))
    val e2 = intercept[Exception] {
      TokenBucket.replay(ev((0L, 1L), (1L, 2L), (2L, 3L)),
        "key", "i", "id", 1, 10, 2, maxPoints = 2L).collect() }
    assert(e2.getMessage.contains("exceeds 2"))
    val mixed = Seq((Some("k"), Some(0L), Some(1L)), (None, Some(0L), Some(2L)),
      (Some("k"), None, Some(3L))).toDF("key", "i", "id")
    val got = TokenBucket.replay(mixed, "key", "i", "id", 1, 10, 2).collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }

  test("first_rejected_id follows replay order, not id order (r10 fix)") {
    // ids not monotone with idx: the first REJECTED event is id 9
    val df = ev((0L, 5L), (1L, 9L), (2L, 3L))
    val r = TokenBucket.summary(df, "key", "i", "id", 1, 100, 1).head()
    assert(r.getLong(2) == 2L && r.getLong(3) == 9L)
  }
}
