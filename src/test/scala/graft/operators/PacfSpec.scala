package graft.operators

import graft.SparkSpec

class PacfSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala replay of the declared math (BigInt everywhere). */
  private def reference(xs: Seq[Long]): Seq[(Int, Option[Long], Option[Long])] = {
    val n = BigInt(xs.size); val s = BigInt(xs.sum)
    val y = xs.map(x => n * x - s)
    val c0 = y.map(v => v * v).sum
    def c(k: Int): Option[BigInt] =
      if (xs.size <= k) None else Some((0 until xs.size - k).map(t => y(t) * y(t + k)).sum)
    def sgnDiv(num: BigInt, den: BigInt): BigInt =
      (if (num < 0) -BigInt(1) else BigInt(1)) * (num.abs / den)
    def r(k: Int): Option[BigInt] =
      if (c0 <= 0) None else c(k).map(ck => sgnDiv(ck * 1000000, c0))
    val r0 = BigInt(1000000)
    val (or1, or2, or3) = (r(1), r(2), r(3))
    val p1 = or1
    val p2 = for { r1 <- or1; r2 <- or2
                   den = r0 * r0 - r1 * r1 if den > 0 }
      yield sgnDiv((r0 * r2 - r1 * r1) * 1000000, den)
    val p3 = for { r1 <- or1; r2 <- or2; r3 <- or3
                   det = r0.pow(3) - 2 * r0 * r1 * r1 - r0 * r2 * r2 + 2 * r1 * r1 * r2
                   if det > 0 }
      yield sgnDiv((r0 * (r0 * r3 - r2 * r1) - r1 * (r1 * r3 - r2 * r2) +
        r1 * (r1 * r1 - r0 * r2)) * 1000000, det)
    Seq(
      (1, or1.map(_.toLong), p1.map(_.toLong)),
      (2, or2.map(_.toLong), or2.flatMap(_ => p2).map(_.toLong)),
      (3, or3.map(_.toLong), or3.flatMap(_ => p3).map(_.toLong)))
  }

  private def run(series: Map[String, Seq[Long]]) = {
    val df = series.toSeq.flatMap { case (g, xs) =>
      xs.zipWithIndex.map { case (x, t) => (g, t.toLong, x) }
    }.toDF("g", "t", "x")
    Pacf.pacf(df, "g", "t", "x").collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
  }

  test("matches the BigInt reference on AR-ish, alternating and trending series") {
    val series = Map(
      "ar" -> Seq(10L, 14L, 12L, 15L, 13L, 16L, 14L, 17L, 15L, 18L, 16L, 19L),
      "alt" -> Seq(5L, -5L, 5L, -5L, 5L, -5L, 5L, -5L),
      "trend" -> (1L to 20L).toSeq,
      "noise" -> Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L, 8L, 9L, 7L))
    val got = run(series)
    for ((g, xs) <- series; (lag, acf, pacf) <- reference(xs)) {
      assert(got((g, lag))._2 == acf, s"$g lag $lag acf")
      assert(got((g, lag))._3 == pacf, s"$g lag $lag pacf")
      assert(got((g, lag))._1 == xs.size.toLong)
    }
  }

  test("AR(1) signature: PACF cuts off after lag 1 (|pacf2|,|pacf3| << pacf1)") {
    // a deterministic stationary AR(1): x_t = (3*x_{t-1} + w_t) div 4,
    // w a bounded hash walk — phi = 0.75 persistence, values stay ~1e2
    var x = 400L; var seed = 7L
    val xs = (1 to 60).map { _ =>
      seed = (seed * 31 + 17) % 41
      x = (3 * x + 400 + (seed - 20) * 10) / 4
      x
    }
    val got = run(Map("s" -> xs))
    val p1 = got(("s", 1))._3.get
    val p2 = got(("s", 2))._3.get
    assert(p1 > 150000L, s"pacf1 = $p1") // clear persistence above the noise
    assert(math.abs(p2) < p1 / 2, s"pacf2 = $p2 vs pacf1 = $p1")
    // and it matches the reference bit-for-bit
    for ((lag, acf, pacf) <- reference(xs)) {
      assert(got(("s", lag))._2 == acf && got(("s", lag))._3 == pacf, s"lag $lag")
    }
  }

  test("degenerates: constant series NULL everywhere; short series NULL past their length") {
    val got = run(Map("const" -> Seq(7L, 7L, 7L, 7L), "short" -> Seq(1L, 5L, 2L)))
    for (lag <- 1 to 3) {
      assert(got(("const", lag))._2.isEmpty && got(("const", lag))._3.isEmpty)
    }
    // n=3: lags 1,2 have pairs, lag 3 does not
    assert(got(("short", 1))._2.nonEmpty)
    assert(got(("short", 2))._2.nonEmpty)
    assert(got(("short", 3))._2.isEmpty && got(("short", 3))._3.isEmpty)
    // perfectly alternating +-c: r1 hits -1e6 exactly? |r1| = r0 degenerates pacf2
    val alt = run(Map("a" -> Seq(1L, -1L, 1L, -1L, 1L, -1L)))
    for ((lag, acf, pacf) <- reference(Seq(1L, -1L, 1L, -1L, 1L, -1L))) {
      assert(alt(("a", lag))._2 == acf && alt(("a", lag))._3 == pacf)
    }
  }

  test("gap honesty: missing indexes contribute no pair (same as the reference on the gapped series)") {
    // series with a hole at t=5: pairs across the hole only where t2-t1 <= 3 matches
    val pts = Seq((0L, 4L), (1L, 8L), (2L, 6L), (3L, 9L), (4L, 7L),
      (6L, 10L), (7L, 5L), (8L, 11L))
    val df = pts.map { case (t, x) => ("g", t, x) }.toDF("g", "t", "x")
    val got = Pacf.pacf(df, "g", "t", "x").collect()
      .map(r => (r.getInt(1), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // independent check of C_1 with the hole: pairs (0,1)...(3,4),(6,7),(7,8)
    val n = BigInt(8); val s = BigInt(pts.map(_._2).sum)
    val y = pts.map { case (t, x) => t -> (n * x - s) }.toMap
    val c0 = y.values.map(v => v * v).sum
    val c1 = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 6L -> 7L, 7L -> 8L)
      .map { case (a, b) => y(a) * y(b) }.sum
    val expR1 = (if (c1 < 0) -BigInt(1) else BigInt(1)) * ((c1.abs * 1000000) / c0)
    assert(got(1) == Some(expR1.toLong))
  }
}
