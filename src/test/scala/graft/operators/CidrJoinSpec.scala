package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CIDR join: longest-prefix hand cases incl. /0 expansion, strict
  * ipv4 parsing, all four dim raises, fact-side NULL conventions,
  * enrich row preservation, and the no-nested-loop plan pin.
  */
class CidrJoinSpec extends SparkSpec {

  import spark.implicits._

  private val nets = Seq(
    ("10.0.0.0/8", "corp"),
    ("10.1.0.0/16", "office"),
    ("0.0.0.0/0", "default")).toDF("cidr", "label")

  private def ip(s: String): Long = {
    val p = s.split("\\.").map(_.toLong)
    (p(0) << 24) | (p(1) << 16) | (p(2) << 8) | p(3)
  }

  test("longest prefix wins; /0 catches everything else") {
    val facts = Seq((1L, ip("10.1.2.3")), (2L, ip("10.2.3.4")),
      (3L, ip("192.168.0.1"))).toDF("id", "ipv")
    val got = CidrJoin.matchMap(facts, "id", "ipv", nets, "cidr", Seq("label"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(got(1L) == ("office", 16L))
    assert(got(2L) == ("corp", 8L))
    assert(got(3L) == ("default", 0L))
  }

  test("ipv4ToLong: exact values and strict NULL on malformed") {
    val df = Seq("255.255.255.255", "1.2.3.4", "0.0.0.0", "1.2.3",
      "1.2.3.256", "a.b.c.d", "1.2.3.4.5").toDF("s")
      .select(CidrJoin.ipv4ToLong(col("s")).as("v"))
    val vs = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(vs(0).contains(4294967295L))
    assert(vs(1).contains(16909060L))
    assert(vs(2).contains(0L))
    assert(vs.drop(3).forall(_.isEmpty))
  }

  test("dim raises: malformed CIDR, host bits, bad length, duplicates") {
    val facts = Seq((1L, ip("10.0.0.1"))).toDF("id", "ipv")
    def run(rows: Seq[(String, String)]) =
      CidrJoin.matchMap(facts, "id", "ipv",
        rows.toDF("cidr", "label"), "cidr", Seq("label")).collect()
    val e1 = intercept[Exception](run(Seq(("10.0.0.0", "x"))))
    assert(e1.getMessage.contains("malformed CIDR"))
    val e2 = intercept[Exception](run(Seq(("10.1.2.3/8", "x"))))
    assert(e2.getMessage.contains("host bits"))
    val e3 = intercept[Exception](run(Seq(("10.0.0.0/33", "x"))))
    assert(e3.getMessage.contains("malformed CIDR"))
    val e4 = intercept[Exception](
      run(Seq(("10.0.0.0/8", "x"), ("10.0.0.0/8", "y"))))
    assert(e4.getMessage.contains("duplicate network"))
  }

  test("fact-side NULL / out-of-range addresses: unmatched, never dropped") {
    val facts = Seq((1L, Some(ip("10.0.0.1"))), (2L, None),
      (3L, Some(-5L)), (4L, Some(4294967296L))).toDF("id", "ipv")
    val small = Seq(("10.0.0.0/8", "corp")).toDF("cidr", "label")
    val enriched = CidrJoin.enrich(facts, "id", "ipv", small, "cidr",
      Seq("label")).collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getString(2)))).toMap
    assert(enriched.size == 4)
    assert(enriched(1L).contains("corp"))
    assert(Seq(2L, 3L, 4L).forall(enriched(_).isEmpty))
  }

  test("a /4 network expands into its 16 band buckets and still matches") {
    val wide = Seq(("16.0.0.0/4", "sixteen")).toDF("cidr", "label")
    val facts = Seq((1L, ip("31.255.255.255")), (2L, ip("32.0.0.0")))
      .toDF("id", "ipv")
    val got = CidrJoin.matchMap(facts, "id", "ipv", wide, "cidr", Seq("label"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L)) // 16.0.0.0/4 covers 16.0.0.0 - 31.255.255.255
  }

  test("no nested-loop plan: the band join is an equi broadcast join") {
    val facts = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("id"),
        expr("(o_orderkey * 2654435761) % 4294967296").as("ipv"))
    val plan = CidrJoin.matchMap(facts, "id", "ipv", nets, "cidr",
      Seq("label")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested-loop leak:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
  }
}
