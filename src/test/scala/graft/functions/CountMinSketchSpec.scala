package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch: one-sided error (never undercounts), partitioning
  * independence (the matrix is a commutative monoid), exactness when no
  * bucket collides, and the null-skip contract.
  */
class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 3
  private val width = 64

  private def estimates(df: org.apache.spark.sql.DataFrame, itemCol: String) = {
    val sk = df.agg(CountMinSketch(depth, width)(
      CountMinSketch.buckets(col(itemCol), depth, width)).as("sk"))
    df.select(itemCol).where(col(itemCol).isNotNull).distinct()
      .crossJoin(broadcast(sk))
      .select(col(itemCol),
        CountMinSketch.estimate(col("sk"), col(itemCol), depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount and are exact for non-colliding items") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val truth = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(docs, "lang")
    assert(est.keySet === truth.keySet)
    truth.foreach { case (lang, n) =>
      assert(est(lang) >= n, s"CMS undercounted $lang: ${est(lang)} < $n")
    }
    // depth=3, width=64, |langs| small: at least one depth should separate
    // every lang — so in practice the estimates are exact here; if the
    // md5 layout ever collides on all 3 depths this assertion documents it
    assert(est === truth, "expected the exact regime for this lang set")
  }

  test("partitioning independence: same sketch on any layout") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = estimates(docs, "lang")
    for (parts <- Seq(1, 7)) {
      assert(estimates(docs.repartition(parts), "lang") === base, s"parts=$parts")
    }
  }

  test("adversarial collisions still never undercount") {
    // 2000 distinct items into width 64: every bucket collides heavily
    val df = (0 until 2000).flatMap(i => Seq.fill(i % 3 + 1)(s"item$i"))
      .toDF("item")
    val truth = df.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(df, "item")
    truth.foreach { case (item, n) =>
      assert(est(item) >= n, s"CMS undercounted $item: ${est(item)} < $n")
    }
    // total mass bound: a depth row sums to N, so no estimate exceeds N
    val total = truth.values.sum
    est.values.foreach(e => assert(e <= total))
  }

  test("null items are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("item")
    val est = estimates(df, "item")
    assert(est === Map("a" -> 2L, "b" -> 1L))
  }

  test("inner product: exact join size in the collision-free regime, never under") {
    import graft.operators.GuardedJoin
    // left: key k repeated k times (k=1..6); right: each key twice
    val l = (1 to 6).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val r = (1 to 6).flatMap(k => Seq.fill(2)(k.toLong)).toDF("k")
    val exact = (1 to 6).map(k => k * 2L).sum // Σ n_l·n_r = 42
    val est = GuardedJoin.estimateInnerRows(l, r, "k", depth = 4, width = 512)
      .head().getLong(0)
    assert(est >= exact)           // one-sided: collisions only add
    assert(est <= exact + 50)      // 6 keys in 512 cells: almost surely exact
  }

  test("inner product: disjoint key sets estimate near zero") {
    import graft.operators.GuardedJoin
    val l = (1 to 20).map(_.toLong).toDF("k")
    val r = (100 to 120).map(_.toLong).toDF("k")
    val est = GuardedJoin.estimateInnerRows(l, r, "k", depth = 4, width = 512)
      .head().getLong(0)
    assert(est <= 5L) // true size 0; only hash collisions can contribute
  }

  test("oracle SQL replays the same sketch (DuckDB-shaped arithmetic)") {
    // the oracle is plain SQL over md5; spot-check its Spark rendering of
    // the same formula agrees with the aggregator's buckets
    val df = Seq("zh", "en", "fr").toDF("lang")
    val viaCols = df.select(col("lang"),
        CountMinSketch.buckets(col("lang"), depth, width).as("b")).collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    // Spark spells hex→int as conv(); DuckDB spells it '0x'||…::BIGINT —
    // same 60-bit value (the DuckDB side is exercised by the driver gate)
    val viaSql = df.selectExpr("lang",
        s"array(" + (0 until depth).map(d =>
          s"CAST(pmod(CAST(conv(substr(md5('cms$d:'||lang),1,15),16,10) AS BIGINT), $width) AS INT)")
          .mkString(",") + ") AS b").collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(viaCols === viaSql)
  }
}
