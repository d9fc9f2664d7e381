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
}
