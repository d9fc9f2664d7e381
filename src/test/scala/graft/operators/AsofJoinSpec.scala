package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** As-of join semantics (inclusive vs strict, tie-break, unmatched rows,
  * multi-column payload atomicity) plus the scale contract: the physical
  * plan must contain exactly one exchange and no join operator at all.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (key, ts, qid, px); trades: (key, ts, tid)
  private lazy val quotes = Seq(
    ("A", 10L, 1L, 100.0), ("A", 20L, 2L, 101.0), ("A", 20L, 3L, 102.0),
    ("A", 40L, 4L, 103.0), ("B", 15L, 5L, 200.0)
  ).toDF("k", "ts", "qid", "px")
  private lazy val trades = Seq(
    ("A", 20L, 10L), ("A", 30L, 11L), ("A", 5L, 12L), ("B", 15L, 13L), ("C", 50L, 14L)
  ).toDF("k", "ts", "tid")

  private def run(strict: Boolean) =
    AsofJoin.asofBackward(trades, quotes, on = Seq("k"), ts = "ts",
        payload = Seq("qid", "px"), strict = strict, tieBreak = Some("qid"))
      .orderBy("tid").collect().map(r =>
        (r.getAs[Long]("tid"), Option(r.getAs[Any]("qid")), Option(r.getAs[Any]("px"))))

  test("inclusive: equal ts matches; ties broken by largest tieBreak; no-match is null") {
    val out = run(strict = false)
    assert(out === Seq(
      (10L, Some(3L), Some(102.0)),  // ts=20: both qid 2 and 3 at 20, largest wins
      (11L, Some(3L), Some(102.0)),  // ts=30: latest quote <= 30 is ts=20
      (12L, None, None),             // ts=5: no quote yet
      (13L, Some(5L), Some(200.0)),  // exact same ts on key B
      (14L, None, None)))            // key C has no quotes at all
  }

  test("strict: equal ts does NOT match") {
    val out = run(strict = true)
    assert(out === Seq(
      (10L, Some(1L), Some(100.0)),  // ts=20 strict -> latest strictly-before is ts=10
      (11L, Some(3L), Some(102.0)),
      (12L, None, None),
      (13L, None, None),             // B's only quote is at the same ts
      (14L, None, None)))
  }

  test("payload columns come from the same matched row") {
    // quote qid=3 has px=102.0; a per-column last() would be allowed to pair
    // qid=3 with px from a different row — the struct transport forbids it
    val out = run(strict = false).collect { case (_, Some(q), Some(p)) => (q, p) }
    val quoteMap = Map(1L -> 100.0, 2L -> 101.0, 3L -> 102.0, 4L -> 103.0, 5L -> 200.0)
    out.foreach { case (q, p) => assert(quoteMap(q.asInstanceOf[Long]) === p) }
  }

  test("plan has one exchange and no join operator") {
    val df = AsofJoin.asofBackward(trades, quotes, on = Seq("k"), ts = "ts",
      payload = Seq("qid", "px"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }

  test("suffix escapes collisions and is required when colliding") {
    val clash = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades, quotes.withColumnRenamed("qid", "tid"),
        on = Seq("k"), ts = "ts", payload = Seq("tid"))
    }
    assert(clash.getMessage.contains("collides"))
    val ok = AsofJoin.asofBackward(trades, quotes.withColumnRenamed("qid", "tid"),
      on = Seq("k"), ts = "ts", payload = Seq("tid"), suffix = "_q")
    assert(ok.columns.contains("tid_q"))
  }

  test("asofForwardWithin: next match beyond the window reads as no-conversion") {
    // trade A@5 → next quote A@10 (gap 5, in-window at 5); trade A@30 →
    // next quote A@40 (gap 10, beyond a 5 window)
    val within = AsofJoin.asofForwardWithin(trades, quotes,
        on = Seq("k"), ts = "ts", payload = Seq("qid"),
        maxGap = lit(5L), tieBreak = Some("qid"))
      .collect().map(r => r.getAs[Long]("tid") -> Option(r.getAs[Any]("qid"))).toMap
    assert(within(12L).contains(1L)) // A@5 → A@10, gap 5 ≤ 5
    assert(within(11L).isEmpty)      // A@30 → A@40 is 10 beyond
  }

  test("asofBackwardWithin: payload collision raises like asofBackward") {
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofBackwardWithin(trades, quotes.withColumnRenamed("qid", "tid"),
        on = Seq("k"), ts = "ts", payload = Seq("tid"), maxGap = lit(5L))
    }
    assert(e.getMessage.contains("collides"))
  }

  test("Within variants: a payload naming the ts column fails AT the API") {
    Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => Any](
      (l, r) => AsofJoin.asofBackwardWithin(l, r, on = Seq("k"), ts = "ts",
        payload = Seq("qid", "ts"), maxGap = lit(5L)),
      (l, r) => AsofJoin.asofForwardWithin(l, r, on = Seq("k"), ts = "ts",
        payload = Seq("qid", "ts"), maxGap = lit(5L))
    ).foreach { f =>
      val e = intercept[IllegalArgumentException](f(trades, quotes))
      assert(e.getMessage.contains("must not contain the ts column"))
    }
  }

  test("asofBackwardWithin: stale matches blank to NULL, fresh ones survive") {
    // trade A@30 matches quote A@20 (gap 10); trade A@5 has no match;
    // trade C@50 has no match; with maxGap 5 the A@30 match is stale
    val within = AsofJoin.asofBackwardWithin(trades, quotes,
        on = Seq("k"), ts = "ts", payload = Seq("qid", "px"),
        maxGap = lit(5L), tieBreak = Some("qid"))
      .orderBy("tid").collect().map(r =>
        (r.getAs[Long]("tid"), Option(r.getAs[Any]("qid"))))
    val m = within.toMap
    assert(m(10L).contains(3L)) // A@20 exact match, gap 0 ≤ 5
    assert(m(11L).isEmpty)      // A@30 → quote A@20 is 10 stale
    assert(m(13L).contains(5L)) // B@15 exact
    assert(m(14L).isEmpty)      // C: no match at all
  }
}
