package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deletion-blocking ED-join contracts: losslessness vs local brute force
  * (blocking must never drop a true pair), degenerate-length strings,
  * partitioning independence, the k domain, and the no-cartesian plan
  * shape.
  */
class EdJoinSpec extends SparkSpec {

  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && math.abs(sa.length - sb.length) <= k && lev(sa, sb) <= k
    } yield (ia, ib, lev(sa, sb).toLong)).toSet

  private def run(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    EdJoin.selfJoin(rows.toDF("id", "s"), "id", "s", k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("lossless on real keys: equals brute force over a customer sample") {
    val rows = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name").limit(400).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    Seq(1, 2).foreach { k => assert(run(rows, k) == brute(rows, k), s"k=$k") }
  }

  test("degenerate lengths: empty, single-char, and cross-length pairs") {
    val rows = Seq((1L, "ab"), (2L, "ac"), (3L, "abc"), (4L, "abcd"),
      (5L, "abcde"), (6L, "zzzz"), (7L, ""), (8L, "a"), (9L, "b"))
    Seq(1, 2).foreach { k => assert(run(rows, k) == brute(rows, k), s"k=$k") }
  }

  test("transpositions cost 2 (classic Levenshtein, not Damerau)") {
    val rows = Seq((1L, "abcdef"), (2L, "abdcef"))
    assert(run(rows, 1) == Set.empty)
    assert(run(rows, 2) == Set((1L, 2L, 2L)))
  }

  test("exact duplicates pair at distance 0") {
    val rows = Seq((1L, "same key"), (2L, "same key"), (3L, "same key"))
    assert(run(rows, 1) == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }

  test("result is independent of input partitioning") {
    val df = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("s")).limit(600)
    val x = EdJoin.selfJoin(df.repartition(7), "id", "s", 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val y = EdJoin.selfJoin(df.repartition(2), "id", "s", 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(x == y)
  }

  test("null strings never pair") {
    val rows = Seq((1L, "abcd"), (2L, null.asInstanceOf[String]), (3L, "abcd"))
    assert(run(rows, 1) == Set((1L, 3L, 0L)))
  }

  test("k outside the deletion-blocking domain is rejected") {
    val df = Seq((1L, "abc")).toDF("id", "s")
    intercept[IllegalArgumentException](EdJoin.selfJoin(df, "id", "s", 0))
    intercept[IllegalArgumentException](EdJoin.selfJoin(df, "id", "s", 3))
  }

  test("plan: variant-hash equi-join — the corpus never cross-joins itself") {
    val df = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val plan = EdJoin.selfJoin(df, "id", "s", 1).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
