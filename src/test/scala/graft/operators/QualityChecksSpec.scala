package graft.operators

import graft.SparkSpec
import graft.operators.QualityChecks._

/** Rule-by-rule adversarial checks, exact per-mille boundaries, and the
  * one-scan plan contract.
  */
class QualityChecksSpec extends SparkSpec {

  import spark.implicits._

  private def verdicts(df: org.apache.spark.sql.DataFrame, rules: Seq[Rule]): Map[(String, String), Boolean] =
    check(df, rules).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(5)).toMap

  test("each rule fires on its adversarial input") {
    val df = Seq(
      (1L, Some("a"), 10.0, "X"),
      (2L, None, 500.0, "X"),
      (2L, Some("c"), 20.0, "Z")).toDF("k", "s", "v", "cat")
    val got = verdicts(df, Seq(
      NotNull("s"),                       // 1/3 null
      Unique("k"),                        // k=2 duplicated
      InRange("v", 0.0, 100.0),           // 500.0 out of range
      InSet("cat", Seq("X", "Y")),        // Z not in set
      RowCountBetween(4L, 10L)))          // only 3 rows
    assert(got == Map(
      ("not_null", "s") -> false, ("unique", "k") -> false,
      ("in_range", "v") -> false, ("in_set", "cat") -> false,
      ("row_count", "*") -> false))
  }

  test("a clean table passes every rule") {
    val df = Seq((1L, "a", 1.0, "X"), (2L, "b", 2.0, "Y")).toDF("k", "s", "v", "cat")
    val got = verdicts(df, Seq(
      NotNull("s"), Unique("k"), InRange("v", 0.0, 100.0),
      InSet("cat", Seq("X", "Y")), RowCountBetween(1L, 10L)))
    assert(got.values.forall(identity))
  }

  test("per-mille thresholds are exact at the boundary") {
    // exactly 900 of 1000 rows in range: metric 900*1000 == bound 1000*900
    val df = (1 to 1000).map(i => i.toLong -> (if (i <= 900) 1.0 else 999.0))
      .toDF("k", "v")
    val at = verdicts(df, Seq(InRange("v", 0.0, 100.0, minPerMille = 900)))
    assert(at(("in_range", "v")))
    val above = verdicts(df, Seq(InRange("v", 0.0, 100.0, minPerMille = 901)))
    assert(!above(("in_range", "v")))
  }

  test("nulls count against in_range coverage denominator only when present") {
    // 2 non-null in range of 3 rows (1 null): denominator is non-nulls (2)
    val df = Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, None)).toDF("k", "v")
    val got = verdicts(df, Seq(InRange("v", 0.0, 100.0, minPerMille = 1000)))
    assert(got(("in_range", "v")), "nulls must not fail full in-range coverage")
  }

  test("rules that differ only in non-alphanumeric chars get distinct counters") {
    // InSet({"a|b"}) matches 1 of 3 rows; InSet({"a","b"}) matches 2 — a
    // lossy aggregate-key sanitization would collapse both onto the first
    // rule's counter and report 1000 twice
    val df = Seq("a|b", "a", "b").toDF("cat")
    val metrics = check(df, Seq(
      InSet("cat", Seq("a|b")), InSet("cat", Seq("a", "b"))))
      .select("metric").collect().map(_.getLong(0)).toSeq
    assert(metrics == Seq(1000L, 2000L))
  }

  test("any number of rules cost one scan and no join") {
    val docs = spark.read.parquet(s"$sf/orders.parquet")
    val plan = check(docs, Seq(
      NotNull("o_orderkey"), Unique("o_orderkey"),
      InRange("o_totalprice", 0.0, 400000.0),
      InSet("o_orderstatus", Seq("F", "O", "P")),
      RowCountBetween(1L, 100000000L))).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.split("Scan parquet").length == 2, s"expected exactly one scan:\n$plan")
  }
}
