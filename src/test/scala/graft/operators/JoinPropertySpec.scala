package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded randomized differential tests: the distributed as-of and range
  * joins must equal a brute-force in-memory reference on arbitrary data —
  * catching edge alignment (ties, empty keys, boundary cells) that
  * hand-picked fixtures miss.
  */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("asofBackward equals brute force on random data (1000 trades, 500 quotes)") {
    val keys = Vector("a", "b", "c", "d")
    val trades = Vector.tabulate(1000)(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(500).toLong))
    val quotes = Vector.tabulate(500)(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(500).toLong, rnd.nextInt(1000)))

    val got = AsofJoin.asofBackward(
        trades.toDF("tid", "k", "ts"),
        quotes.toDF("qid", "k", "ts", "px"),
        on = Seq("k"), ts = "ts", payload = Seq("qid", "px"), tieBreak = Some("qid"))
      .select("tid", "qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    trades.foreach { case (tid, k, ts) =>
      // brute force: max (ts, qid) quote with same key and ts <= trade ts
      val expect = quotes.filter(q => q._2 == k && q._3 <= ts)
        .sortBy(q => (q._3, q._1)).lastOption.map(_._1)
      assert(got(tid) === expect, s"trade $tid key=$k ts=$ts")
    }
  }

  test("asofForward equals brute force on random data") {
    val keys = Vector("a", "b", "c")
    val trades = Vector.tabulate(600)(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(300).toLong))
    val quotes = Vector.tabulate(300)(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(300).toLong, rnd.nextInt(1000)))

    val got = AsofJoin.asofForward(
        trades.toDF("tid", "k", "ts"),
        quotes.toDF("qid", "k", "ts", "px"),
        on = Seq("k"), ts = "ts", payload = Seq("qid", "px"), tieBreak = Some("qid"))
      .select("tid", "qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    trades.foreach { case (tid, k, ts) =>
      // brute force: min-ts quote at-or-after; among (key, ts) ties max qid
      val expect = quotes.filter(q => q._2 == k && q._3 >= ts)
        .sortBy(q => (q._3, -q._1)).headOption.map(_._1)
      assert(got(tid) === expect, s"trade $tid key=$k ts=$ts")
    }
  }

  test("asofNearest equals brute force (backward preferred on distance ties)") {
    val keys = Vector("a", "b")
    val trades = Vector.tabulate(400)(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(200).toLong))
    val quotes = Vector.tabulate(200)(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(200).toLong, rnd.nextInt(1000)))

    val got = AsofJoin.asofNearest(
        trades.toDF("tid", "k", "ts"),
        quotes.toDF("qid", "k", "ts", "px"),
        on = Seq("k"), ts = "ts", payload = Seq("qid", "px"), tieBreak = Some("qid"))
      .select("tid", "qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    trades.foreach { case (tid, k, ts) =>
      val cands = quotes.filter(_._2 == k)
        // per (key, ts) the tieBreak pre-resolves to max qid
        .groupBy(_._3).map { case (_, g) => g.maxBy(_._1) }.toVector
      val expect = cands
        .sortBy(q => ((q._3 - ts).abs, if (q._3 <= ts) 0 else 1))
        .headOption.map(_._1)
      assert(got(tid) === expect, s"trade $tid key=$k ts=$ts")
    }
  }

  test("intervalJoin equals brute force on random intervals (800 points, 300 intervals)") {
    def t(min: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(min))
    val points = Vector.tabulate(800)(i => (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong))
    val ivals = Vector.tabulate(300) { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, rnd.nextInt(3).toLong, s, s + 1 + rnd.nextInt(400))
    }
    val got = RangeJoin.intervalJoin(
        points.map(p => (p._1, p._2, t(p._3))).toDF("pid", "u", "ts"),
        ivals.map(v => (v._1, v._2, t(v._3), t(v._4))).toDF("iid", "iu", "s", "e"),
        tsCol = "ts", startCol = "s", endCol = "e",
        on = Seq("u" -> "iu"), bucket = "3 hours")
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    val expect = (for {
      (pid, u, ts) <- points
      (iid, iu, s, e) <- ivals
      if u == iu && ts >= s && ts < e
    } yield (pid, iid)).toSet
    assert(got === expect)
  }
}
