package graft.operators

import graft.SparkSpec

class KaplanMeierSpec extends SparkSpec {
  import spark.implicits._

  private def row(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)))

  test("hand curve: exact counts, quantized-ln steps, exact-zero terminal NULL") {
    val df = Seq(
      ("x", 1L, 1L), ("x", 2L, 0L), ("x", 3L, 1L), ("x", 3L, 1L),
      ("x", 4L, 0L), ("x", 5L, 1L),
      ("y", 2L, 1L), ("y", 2L, 0L), ("y", 4L, 1L))
      .toDF("g", "t", "e")
    val got = KaplanMeier.curve(df, "g", "t", "e")
      .orderBy("g", "t").collect().map(row).toSeq
    // x: t=1 n=6 d=1 -> floor(1e6*ln(5/6)) = -182322
    //    t=3 n=4 d=2 -> -182322 + floor(1e6*ln(1/2)) = -182322 - 693148
    //    t=5 n=1 d=1 -> survival exactly 0 -> NULL
    // y: t=2 n=3 d=1 c=1 -> floor(1e6*ln(2/3)) = -405466; t=4 n=1 d=1 -> NULL
    assert(got == Seq(
      ("x", 1L, 6L, 1L, 0L, Some(-182322L)),
      ("x", 3L, 4L, 2L, 0L, Some(-875470L)),
      ("x", 5L, 1L, 1L, 0L, None),
      ("y", 2L, 3L, 1L, 1L, Some(-405466L)),
      ("y", 4L, 1L, 1L, 0L, None)))
  }

  test("pure-censoring times publish no row but shrink the at-risk set") {
    val df = Seq(("g", 1L, 0L), ("g", 1L, 0L), ("g", 2L, 1L), ("g", 3L, 0L))
      .toDF("g", "t", "e")
    val got = KaplanMeier.curve(df, "g", "t", "e").collect().map(row).toSeq
    // t=1 censors 2 of 4; at t=2 only 2 at risk -> ln(1/2)
    assert(got == Seq(("g", 2L, 2L, 1L, 0L, Some(-693148L))))
  }

  test("censoring never deflates survival: all-censored group publishes nothing") {
    val df = Seq(("g", 1L, 0L), ("g", 5L, 0L)).toDF("g", "t", "e")
    assert(KaplanMeier.curve(df, "g", "t", "e").isEmpty)
  }

  test("contracts: negative duration and non-0/1 event raise; NULLs drop; NULL group is a stratum") {
    val bad = Seq(("g", -1L, 1L)).toDF("g", "t", "e")
    val ex = intercept[Exception](
      KaplanMeier.curve(bad, "g", "t", "e").collect())
    assert(ex.getMessage.contains("negative duration"))
    val bad2 = Seq(("g", 1L, 2L)).toDF("g", "t", "e")
    val ex2 = intercept[Exception](
      KaplanMeier.curve(bad2, "g", "t", "e").collect())
    assert(ex2.getMessage.contains("event must be 0 or 1"))
    val withNulls = Seq(
      (Some("g"), Some(1L), Some(1L)),
      (Some("g"), Option.empty[Long], Some(1L)),
      (Some("g"), Some(2L), Option.empty[Long]),
      (Option.empty[String], Some(3L), Some(1L)))
      .toDF("g", "t", "e")
    val got = KaplanMeier.curve(withNulls, "g", "t", "e").collect()
    assert(got.length == 2) // ("g", t=1) and (NULL stratum, t=3)
    assert(got.exists(_.isNullAt(0)))
  }

  test("curve matches its DuckDB-shaped oracle semantics on a mixed fixture") {
    // cross-check the Spark plan against an independent Scala replay of the
    // oracle's math (counts exact, steps = floor(1e6*ln((n-d)/n)))
    val subjects = for {
      g <- Seq("a", "b"); i <- 1 to 40
    } yield (g, ((i * 7) % 13 + 1).toLong, (i % 3 min 1).toLong)
    val df = subjects.toDF("g", "t", "e")
    val got = KaplanMeier.curve(df, "g", "t", "e")
      .orderBy("g", "t").collect().map(row).toSeq
    val expect = subjects.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (g, rows) =>
      val byT = rows.groupBy(_._2).toSeq.sortBy(_._1)
      val n0 = rows.size.toLong
      var before = 0L; var lnq = 0L; var zero = false
      byT.flatMap { case (t, rs) =>
        val d = rs.count(_._3 == 1L).toLong
        val c = rs.size - d
        val n = n0 - before
        before += d + c
        if (d > 0 && n > d)
          lnq += math.floor(1e6 * math.log((n - d).toDouble / n.toDouble)).toLong
        if (d > 0 && n == d) zero = true
        if (d > 0) Some((g, t, n, d, c, if (zero) None else Some(lnq)))
        else None
      }
    }
    assert(got == expect)
  }
}
