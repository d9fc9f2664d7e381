package graft.operators

import graft.SparkSpec

/** Multi-label eval: hand micro counts, micro-vs-macro divergence on
  * head/tail labels, the never-predicted-label convention, exact
  * match, dedup and NULL conventions.
  */
class MultiLabelEvalSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Seq[String], Seq[String])*) =
    rows.map { case (g, p) => ("g", g, p) }.toDF("grp", "g", "p")

  test("hand micro counts and single-division f1") {
    val df = ev(
      (Seq("a", "b"), Seq("a")),        // tp 1, fp 0, fn 1
      (Seq("a"), Seq("a", "c")),        // tp 1, fp 1, fn 0
      (Seq("b"), Seq("b")))             // tp 1, fp 0, fn 0
    val r = MultiLabelEval.evaluate(df, "grp", "g", "p").head()
    assert(r.getLong(3) == 3L && r.getLong(4) == 1L && r.getLong(5) == 1L)
    assert(r.getLong(6) == 750000L)  // p = 3/4
    assert(r.getLong(7) == 750000L)  // r = 3/4
    assert(r.getLong(8) == 750000L)  // f1 = 6/8
    assert(r.getLong(2) == 1L)       // one exact match
  }

  test("micro and macro diverge when a tail label is always missed") {
    // head label 'a' perfect 4 times; tail 'z' missed once
    val df = ev(
      (Seq("a"), Seq("a")), (Seq("a"), Seq("a")),
      (Seq("a"), Seq("a")), (Seq("a"), Seq("a")),
      (Seq("z"), Seq.empty))
    val r = MultiLabelEval.evaluate(df, "grp", "g", "p").head()
    assert(r.getLong(7) == 800000L)   // micro recall 4/5
    assert(r.getLong(9) == 2L)        // labels a, z
    assert(r.getLong(11) == 500000L)  // macro recall (1 + 0)/2
  }

  test("a never-predicted label scores precision 0 and stays counted") {
    val df = ev((Seq("a"), Seq("a")), (Seq("b"), Seq("a")))
    val r = MultiLabelEval.evaluate(df, "grp", "g", "p").head()
    // labels: a (tp1 fp1 -> p=1/2), b (never predicted -> p=0)
    assert(r.getLong(9) == 2L && r.getLong(10) == 250000L)
  }

  test("duplicate tags deduplicate; NULL pred is an empty set; NULL gold drops") {
    val df = Seq(
      ("g", Seq("a", "a"), Some(Seq("a", "a", "a"))),
      ("g", Seq("b"), None),
      (null.asInstanceOf[String], Seq("x"), Some(Seq("x"))))
      .toDF("grp", "g", "p")
      .where($"grp".isNotNull || $"grp".isNull) // keep all
    val withNullGold = Seq(("g", None: Option[Seq[String]], Some(Seq("a"))))
      .toDF("grp", "g", "p")
    val r = MultiLabelEval.evaluate(
      df.where($"grp" === "g").unionByName(withNullGold), "grp", "g", "p")
      .head()
    assert(r.getLong(1) == 2L)             // NULL gold dropped
    assert(r.getLong(3) == 1L && r.getLong(4) == 0L) // dedup: tp 1, fp 0
    assert(r.getLong(5) == 1L)             // the NULL-pred row's b
  }

  test("empty-prediction groups publish NULL precision, zero recall") {
    val df = ev((Seq("a"), Seq.empty), (Seq("b"), Seq.empty))
    val r = MultiLabelEval.evaluate(df, "grp", "g", "p").head()
    assert(r.isNullAt(6))            // micro p: 0/0
    assert(r.getLong(7) == 0L)       // micro r: 0/2
    assert(r.getLong(11) == 0L)      // macro r
  }
}
