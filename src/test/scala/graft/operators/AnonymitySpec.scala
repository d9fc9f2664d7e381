package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-anonymity: audit contents, suppression complement, NULL-as-value
  * cohorts, and the broadcast anti-join plan shape.
  */
class AnonymitySpec extends SparkSpec {

  import spark.implicits._

  private def df = Seq(
    (1L, Some("us"), "a"), (2L, Some("us"), "a"), (3L, Some("us"), "a"),
    (4L, Some("de"), "b"), (5L, Some("de"), "b"),
    (6L, Some("fr"), "c"),
    (7L, None: Option[String], "d"), (8L, None: Option[String], "d"))
    .toDF("id", "country", "grp")

  test("audit lists exactly the under-k cohorts with their sizes") {
    val got = Anonymity.audit(df, Seq("country", "grp"), k = 3)
      .as[(Option[String], String, Long)].collect().toSet
    assert(got === Set((Some("de"), "b", 2L), (Some("fr"), "c", 1L),
      (None, "d", 2L)))
  }

  test("suppress keeps exactly the rows of cohorts of size >= k") {
    val kept = Anonymity.suppress(df, Seq("country", "grp"), k = 3)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
  }

  test("NULL quasi-identifier values form their own cohort and suppress correctly") {
    val kept = Anonymity.suppress(df, Seq("country", "grp"), k = 2)
      .select("id").as[Long].collect().toSet
    // (NULL, d) has 2 members → kept at k=2; (fr, c) singleton → dropped
    assert(kept === Set(1L, 2L, 3L, 4L, 5L, 7L, 8L))
  }

  test("fully anonymous data: empty audit, full suppress pass-through") {
    val ok = Seq((1L, "x"), (2L, "x")).toDF("id", "q")
    assert(Anonymity.audit(ok, Seq("q"), 2).count() === 0L)
    assert(Anonymity.suppress(ok, Seq("q"), 2).count() === 2L)
  }

  test("plan: suppression is an anti-join, no window over row data") {
    val plan = Anonymity.suppress(df, Seq("country", "grp"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"))
    assert(!plan.contains("Window"))
  }

  test("diversity: hand-checked TVD incl. the absent-value arm") {
    // g1: 3A,1B  g2: 1A,3B  g3: 2C — global A=4,B=4,C=2, N=10
    val d = Seq(
      ("g1", "A"), ("g1", "A"), ("g1", "A"), ("g1", "B"),
      ("g2", "A"), ("g2", "B"), ("g2", "B"), ("g2", "B"),
      ("g3", "C"), ("g3", "C"))
      .toDF("q", "s")
    val got = Anonymity.diversityAudit(d, Seq("q"), "s")
      .orderBy("q").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // TVD(g1) = ½(|.75−.4|+|.25−.4|+|0−.2|) = 0.35; g3 = ½(.4+.4+.8) = 0.8
    assert(got.toSeq == Seq(("g1", 4L, 2L, 3500L), ("g2", 4L, 2L, 3500L),
      ("g3", 2L, 1L, 8000L)))
  }

  test("diversity: two-value mirror cohorts, exact quarter distance") {
    val d = Seq(
      ("g1", "A"), ("g1", "A"), ("g1", "A"), ("g1", "B"),
      ("g2", "A"), ("g2", "B"), ("g2", "B"), ("g2", "B"))
      .toDF("q", "s")
    val got = Anonymity.diversityAudit(d, Seq("q"), "s")
      .orderBy("q").collect()
    assert(got.map(_.getLong(3)).toSeq == Seq(2500L, 2500L))
  }

  test("diversity: a one-value corpus has zero distance and l = 1") {
    val d = Seq(("g1", "A"), ("g1", "A"), ("g2", "A")).toDF("q", "s")
    val got = Anonymity.diversityAudit(d, Seq("q"), "s").collect()
    assert(got.forall(r => r.getLong(2) == 1L && r.getLong(3) == 0L))
  }

  test("diversity: NULL sensitive rows drop; NULL quasi keeps its cohort") {
    val d = Seq(
      (Some("g1"), Some("A")), (Some("g1"), Some("B")),
      (Some("g1"), None), // dropped — discloses nothing
      (None, Some("A")), (None, Some("A")))
      .toDF("q", "s")
    val got = Anonymity.diversityAudit(d, Seq("q"), "s")
      .orderBy(col("q").asc_nulls_first).collect()
    assert(got.length == 2)
    // NULL cohort: 2×A of global A=3,B=1 → TVD = ½(|1−.75|+|0−.25|) = .25
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3)) ==
      ((2L, 1L, 2500L)))
    // g1 cohort: 1A,1B vs global → ½(|.5−.75|+|.5−.25|) = .25
    assert((got(1).getLong(1), got(1).getLong(2), got(1).getLong(3)) ==
      ((2L, 2L, 2500L)))
  }
}
