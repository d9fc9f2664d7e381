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

  test("capped bucket: near-identical corpus stays ~n·cap, clusters stay connected") {
    // 40 keys all within ed 1 of "key0000" siblings: every variant bucket
    // overflows a cap of 3
    val rows = (0L until 40L).map(i => (i, f"key$i%04d"))
    val df = rows.toDF("id", "s")
    val capped = EdJoin.selfJoin(df, "id", "s", k = 1, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = brute(rows, 1)
    // capped ⊆ exact (the cap only drops candidates, never invents)
    assert(capped.subsetOf(exact))
    // every id stays reachable from the lowest-id representative set:
    // union-find over the capped pairs keeps one component
    val parent = scala.collection.mutable.Map((0L until 40L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    capped.foreach { case (a, b, _) => parent(find(a)) = find(b) }
    // ids 0..9, 10..19, ... differ only in digits — with "key" shared the
    // true pair graph over ed<=1 connects ids sharing 3 of 4 digits; check
    // that the capped graph loses NO component relative to the exact graph
    val parentE = scala.collection.mutable.Map((0L until 40L).map(i => i -> i): _*)
    def findE(x: Long): Long = if (parentE(x) == x) x else { val r = findE(parentE(x)); parentE(x) = r; r }
    exact.foreach { case (a, b, _) => parentE(findE(a)) = findE(b) }
    val compsC = (0L until 40L).groupBy(find).values.map(_.toSet).toSet
    val compsE = (0L until 40L).groupBy(findE).values.map(_.toSet).toSet
    assert(compsC == compsE, "capped pair graph must keep the exact components")
    // and the overflow audit names the hot buckets
    val overflow = EdJoin.bucketOverflow(df, "id", "s", k = 1, maxBucket = 3)
    assert(overflow.count() > 0)
    assert(overflow.agg(max(col("n_members"))).head().getLong(0) <= 40L)
  }

  test("roomy cap equals the uncapped pairs; audit is empty when exact") {
    val rows = Seq((1L, "alpha"), (2L, "alphb"), (3L, "beta"), (4L, "betax"))
    val df = rows.toDF("id", "s")
    val capped = EdJoin.selfJoin(df, "id", "s", k = 1, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val uncapped = EdJoin.selfJoin(df, "id", "s", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == uncapped)
    assert(EdJoin.bucketOverflow(df, "id", "s", k = 1, maxBucket = 1000).count() === 0L)
  }
}
