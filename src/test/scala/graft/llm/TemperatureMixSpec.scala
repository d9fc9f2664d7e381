package graft.llm

import graft.SparkSpec

class TemperatureMixSpec extends SparkSpec {
  import spark.implicits._

  private def replay(tokens: Map[String, Seq[Long]], aNum: Long, aDen: Long,
                     budget: Long): Map[String, (Long, Long, Long, Long, Long, Option[Long])] = {
    val per = tokens.map { case (s, ts) => s -> (ts.size.toLong, ts.sum) }
    val raw = per.map { case (s, (_, t)) =>
      s -> (if (t > 0) math.floor(1e6 * math.exp(
        (aNum.toDouble / aDen) * math.log(t.toDouble))).toLong else 0L)
    }
    val traw = BigInt(raw.values.sum)
    per.map { case (s, (n, t)) =>
      val w = if (traw > 0) (BigInt(raw(s)) * 1000000 / traw).toLong else 0L
      val d = if (traw > 0) (BigInt(raw(s)) * budget / traw).toLong else 0L
      val e = if (t > 0) Some((BigInt(d) * 1000000 / t).toLong) else None
      s -> (n, t, raw(s), w, d, e)
    }
  }

  test("matches a plain-Scala replay; weights shift toward small sources as alpha drops") {
    val data = Map(
      "wiki" -> Seq(100L, 200L, 50L),
      "web" -> Seq(50000L, 30000L, 20000L, 40000L),
      "code" -> Seq(4000L, 2000L))
    val df = data.toSeq.flatMap { case (s, ts) => ts.map((s, _)) }.toDF("src", "tok")
    def run(aNum: Long, aDen: Long) =
      TemperatureMix.mix(df, "src", "tok", aNum, aDen, tokenBudget = 1000000L)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    for ((aNum, aDen) <- Seq((1L, 1L), (1L, 2L), (3L, 10L))) {
      assert(run(aNum, aDen) == replay(data, aNum, aDen, 1000000L),
        s"alpha $aNum/$aDen")
    }
    // alpha = 1 is proportional; alpha = 1/2 lifts the small source
    val prop = run(1, 1); val half = run(1, 2)
    assert(half("wiki")._4 > prop("wiki")._4)
    assert(half("web")._4 < prop("web")._4)
    // weights sum to ~1e6 (floor loss < #sources)
    assert(math.abs(half.values.map(_._4).sum - 1000000L) < 3)
  }

  test("epochs flag repetition: budget past a source's tokens pushes epochs_q6 over 1e6") {
    val df = Seq(("tiny", 100L), ("big", 1000000L)).toDF("src", "tok")
    val got = TemperatureMix.mix(df, "src", "tok", 1, 2, tokenBudget = 2000000L)
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(got("tiny") > 1000000L, s"tiny epochs ${got("tiny")}")
  }

  test("zero-token and empty sources carry zero weight; negatives raise; NULL source is a stratum") {
    val df = Seq((Some("a"), Some(1000L)), (Some("z"), Some(0L)),
      (Option.empty[String], Some(500L)), (Some("a"), Option.empty[Long]))
      .toDF("src", "tok")
    val got = TemperatureMix.mix(df, "src", "tok", 1, 2, 1000L)
      .collect().map(r => Option(r.getString(0)).getOrElse("NULL") ->
        (r.getLong(3), if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    assert(got("z")._1 == 0L && got("z")._2.isEmpty)
    assert(got.contains("NULL"))
    val bad = Seq(("a", -5L)).toDF("src", "tok")
    val ex = intercept[Exception](
      TemperatureMix.mix(bad, "src", "tok", 1, 2, 1000L).collect())
    assert(ex.getMessage.contains("negative token count"))
    intercept[IllegalArgumentException](
      TemperatureMix.mix(bad, "src", "tok", 3, 2, 1000L))
  }
}
