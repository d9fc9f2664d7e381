package graft.operators

import graft.SparkSpec

/** CDC net-effect: every first/last op combination, payload finality,
  * the unknown-op guard.
  */
class CdcCompactSpec extends SparkSpec {

  import spark.implicits._

  test("the four net rules; final payload carried; I-then-D vanishes") {
    val log = Seq(
      // k1: I .. U -> net I with the LAST payload
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),
      // k2: I .. D -> nets to nothing
      (2L, 1L, "I", "x"), (2L, 2L, "U", "y"), (2L, 3L, "D", "z"),
      // k3: U .. D -> net D, payload NULL
      (3L, 1L, "U", "p"), (3L, 2L, "D", "q"),
      // k4: U only -> net U
      (4L, 5L, "U", "m"),
      // k5: D then re-I (resurrection) -> first D, last I -> net U
      (5L, 1L, "D", "d"), (5L, 2L, "I", "r"))
      .toDF("k", "seq", "op", "status")
    val got = CdcCompact.netEffect(log, "k", "seq", "op", Seq("status"))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getString(2))))
    assert(got.toSeq == Seq(
      (1L, "I", Some("b")), (3L, "D", None), (4L, "U", Some("m")),
      (5L, "U", Some("r"))))
  }

  test("an unknown op fails the plan loudly") {
    val log = Seq((1L, 1L, "I", "a"), (1L, 2L, "Z", "b"))
      .toDF("k", "seq", "op", "status")
    val ex = intercept[Exception] {
      CdcCompact.netEffect(log, "k", "seq", "op", Seq("status")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("unknown op")))
  }

  test("NULL key or seq rows drop; whale key collapses to one row") {
    val log = (1L to 1000L).map(s => (Some(9L), Some(s), "U", s.toString)) ++
      Seq((None, Some(1L), "I", "n"), (Some(8L), None, "I", "n"))
    val got = CdcCompact.netEffect(
        log.toDF("k", "seq", "op", "status"), "k", "seq", "op", Seq("status"))
      .collect()
    assert(got.length == 1 &&
      got(0).getLong(0) == 9L && got(0).getString(2) == "1000")
  }
}
