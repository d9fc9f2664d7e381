package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bottom-k aggregator: equals the window formulation (the semantics
  * oracle), independent of partitioning (the mergeability contract), and
  * keeps duplicate values (multiset, not distinct).
  */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(99L)
  private lazy val data = Seq.tabulate(5000)(i =>
    (i % 7, rnd.nextInt(200).toLong)).toDF("g", "v")

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(BottomK(k)(col("v")).as("sk"))
      .select(col("g"), posexplode(col("sk")).as(Seq("pos", "v")))
      .select("g", "pos", "v")
      .as[(Int, Int, Long)].collect().toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("v")))
      .where(col("rn") <= k)
      .select(col("g"), (col("rn") - 1).as("pos"), col("v"))
      .as[(Int, Int, Long)].collect().toSet
  }

  test("equals the window bottom-k formulation (incl. duplicates)") {
    assert(viaAgg(data, 16) === viaWindow(data, 16))
  }

  test("partitioning-independent (merge correctness)") {
    assert(viaAgg(data.repartition(1), 8) === viaAgg(data.repartition(13), 8))
  }

  test("groups smaller than k return all members sorted") {
    val tiny = Seq((1, 5L), (1, 3L), (2, 9L)).toDF("g", "v")
    val got = tiny.groupBy("g").agg(BottomK(10)(col("v")).as("sk"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) === Seq(3L, 5L) && got(2) === Seq(9L))
  }

  test("distinct mode equals the distinct window formulation and is merge-stable") {
    val viaDistinctAgg = (df: org.apache.spark.sql.DataFrame, k: Int) =>
      df.groupBy("g").agg(BottomK.distinct(k)(col("v")).as("sk"))
        .select(col("g"), posexplode(col("sk")).as(Seq("pos", "v")))
        .select("g", "pos", "v").as[(Int, Int, Long)].collect().toSet
    val oracle = viaWindow(data.select("g", "v").distinct(), 16)
    assert(viaDistinctAgg(data, 16) === oracle)
    assert(viaDistinctAgg(data.repartition(1), 16) === viaDistinctAgg(data.repartition(13), 16))
  }

  test("kmvEstimate: exact below k, within 3x above k (uniform-ish hashes)") {
    // md5-derived 60-bit hashes of 1..2000 — uniform enough for the sketch
    val m60 = 1L << 60
    val hashed = (1 to 2000).map(i => (i % 2, i)).toDF("g", "x")
      .select(col("g"), graft.text.TextFunctions.fingerprint(col("x").cast("string")).as("v"))
    val est = hashed.groupBy("g").agg(BottomK.distinct(64)(col("v")).as("sk"))
      .select(col("g"), BottomK.kmvEstimate(col("sk"), 64, m60).as("e"))
      .as[(Int, Double)].collect().toMap
    // each group has 1000 distinct values; KMV with k=64 has ~12% stderr
    assert(est.values.forall(e => e > 500 && e < 2000), est.toString)
    // below k: exact
    val tiny = (1 to 10).map(i => (0, i)).toDF("g", "x")
      .select(col("g"), graft.text.TextFunctions.fingerprint(col("x").cast("string")).as("v"))
    val exact = tiny.groupBy("g").agg(BottomK.distinct(64)(col("v")).as("sk"))
      .select(BottomK.kmvEstimate(col("sk"), 64, m60)).head().getDouble(0)
    assert(exact == 10.0)
  }

  test("kmvMerge: sketch(A) ⊕ sketch(B) equals sketch(A ∪ B), both regimes") {
    val k = 16
    def sketch(xs: Seq[Int]): Seq[Long] = xs.toDF("x")
      .select(graft.text.TextFunctions.fingerprint(col("x").cast("string")).as("v"))
      .agg(BottomK.distinct(k)(col("v")).as("sk"))
      .head().getSeq[Long](0)
    def mergeCols(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      Seq((a, b)).toDF("a", "b")
        .select(BottomK.kmvMerge(col("a"), col("b"), k))
        .head().getSeq[Long](0)
    // exact regime: |A ∪ B| < k
    val (smallA, smallB) = ((1 to 5), (4 to 9))
    assert(mergeCols(sketch(smallA), sketch(smallB)) === sketch(smallA ++ smallB))
    // truncating regime: both sketches full, union still equals the
    // directly-built union sketch (the KMV closure property)
    val (bigA, bigB) = ((1 to 200), (150 to 400))
    assert(mergeCols(sketch(bigA), sketch(bigB)) === sketch(bigA ++ bigB))
  }

  test("plan shows partial aggregation below (upstream of) the exchange") {
    val plan = data.groupBy("g").agg(BottomK(4)(col("v")).as("sk"))
      .queryExecution.executedPlan.toString
    // plans print top-down (final agg, then Exchange, then partial agg);
    // the map-side partial pass is the Aggregate BELOW the exchange — its
    // absence (shuffle carries every row) is the regression guarded here
    val ei = plan.indexOf("Exchange")
    assert(ei >= 0, s"no exchange:\n$plan")
    assert(plan.lastIndexOf("Aggregate") > ei,
      s"no partial aggregate upstream of the exchange:\n$plan")
  }
}
