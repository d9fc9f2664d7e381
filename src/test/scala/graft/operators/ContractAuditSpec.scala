package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract audit: per-rule hand violations, NULL conventions, unique
  * duplicate accounting, declaration order, single-pass plan shape.
  */
class ContractAuditSpec extends SparkSpec {

  import spark.implicits._
  import ContractAudit._

  private def df = Seq(
    (Some(1L), Some("en"), Some(10L), Some("src1")),
    (Some(1L), Some("xx"), Some(999L), Some("srcX")),  // dup id, bad lang/range/pattern
    (Some(2L), None, None, None),                      // NULLs
    (Some(3L), Some("de"), Some(50L), Some("src2")))
    .toDF("id", "lang", "n", "src")

  test("every rule kind counts its violations by hand") {
    val got = audit(df, Seq(
        NotNull("lang"), InRange("n", 0L, 100L),
        MatchesRegex("src", "^src[0-9]+$"), OneOf("lang", Seq("en", "de")),
        Unique(Seq("id"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("not_null(lang)") == 1L)      // row 3
    assert(got("in_range(n,0,100)") == 1L)   // 999; NULL not a violation
    assert(got("matches(src,^src[0-9]+$)") == 1L)        // srcX; NULL not a violation
    assert(got("one_of(lang,en|de)") == 1L)        // xx; NULL not a violation
    assert(got("unique(id)") == 1L)          // one extra copy of id 1
  }

  test("rows come back in declaration order with honest n_rows") {
    val got = audit(df, Seq(Unique(Seq("id")), NotNull("lang")))
      .collect()
    assert(got.map(_.getString(0)).toSeq ==
      Seq("unique(id)", "not_null(lang)"))
    assert(got.forall(_.getLong(2) == 4L))
  }

  test("clean table: all zero; NULL keys duplicate under Unique") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(audit(clean, Seq(NotNull("v"), Unique(Seq("id"))))
      .collect().forall(_.getLong(1) == 0L))
    val nulls = Seq((Option.empty[Long], "a"), (Option.empty[Long], "b"))
      .toDF("id", "v")
    val u = audit(nulls, Seq(Unique(Seq("id")))).collect().head
    assert(u.getLong(1) == 1L, "two NULL keys are duplicates (SQL-DISTINCT)")
  }

  test("row-local rules share ONE aggregate pass over the table") {
    val q = audit(df, Seq(NotNull("lang"), InRange("n", 0L, 100L),
      OneOf("lang", Seq("en"))))
    val plan = q.queryExecution.executedPlan.toString
    // one partial/final aggregate pair over the scan, not one per rule
    val scans = plan.linesIterator.count(_.contains("LocalTableScan"))
    assert(scans <= 2, s"row-local rules must share a pass:\n$plan")
  }

  test("two different regex rules on one column are distinct (r10 review fix)") {
    val got = audit(df, Seq(
        MatchesRegex("src", "^src"), MatchesRegex("src", "[0-9]$")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 2)
    assert(got("matches(src,^src)") == 0L)
    assert(got("matches(src,[0-9]$)") == 1L) // srcX fails the digit anchor
  }
}
