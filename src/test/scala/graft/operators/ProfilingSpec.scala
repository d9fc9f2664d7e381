package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("histogram bins, outlier clamping, and null exclusion") {
    val df = Seq[java.lang.Double](0.5, 1.5, 1.7, -10.0, 99.0, null).toDF("v")
    val got = Profiling.histogram(df, col("v"), lo = 0.0, hi = 4.0, nBins = 4)
      .orderBy("bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // -10 clamps to bin 0, 99 clamps to bin 3, null dropped
    assert(got === Map(0L -> 2L, 1L -> 2L, 3L -> 1L))
  }

  test("profile: nulls, distincts, min/max per column in one pass") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a"))
    ).toDF("id", "s")
    val got = Profiling.profile(df, Seq("id", "s")).orderBy("column").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("id") === ((4L, 0L, 4L, "1", "4")))
    assert(got("s") === ((4L, 1L, 2L, "a", "b")))
  }

  test("zValue interleaves bits (known values) and orders within a row of cells") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L)).toDF("x", "y")
    val got = df.select(ZOrder.zValue(col("x"), col("y"), bits = 3).as("z"))
      .as[Long].collect()
    assert(got.toSeq === Seq(0L, 1L, 2L, 3L, 39L))
    // for fixed y, z is monotone in x (order preserved within a curve row)
    val zs = (0L to 7L).map(x => Seq((x, 2L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 3).as("z")).as[Long].head())
    assert(zs === zs.sorted)
  }

  test("z-order locality beats linear order on 2-D range queries") {
    // 16x16 grid; a 4x4 query box touches fewer distinct z-runs than
    // row-major runs of the same box — the pruning win in file terms
    val grid = for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // files of 16 consecutive rows in each layout; count files touched by box
    def filesTouched(sorted: Seq[(Long, Long, Long)]): Int =
      sorted.zipWithIndex
        .filter { case ((x, y, _), _) => x >= 4 && x < 8 && y >= 4 && y < 8 }
        .map(_._2 / 16).distinct.size
    val zFiles = filesTouched(df.sortBy(_._3).toSeq)
    val rowMajorFiles = filesTouched(df.sortBy(t => (t._1, t._2)).toSeq)
    assert(zFiles < rowMajorFiles, s"z=$zFiles rowMajor=$rowMajorFiles")
  }

  test("fdViolations: only keys with >1 RHS value (or NULL alongside values)") {
    import spark.implicits._
    val d = Seq(
      (1L, Option("a")), (1L, Option("a")),           // clean key
      (2L, Option("a")), (2L, Option("b")),           // two values → violation
      (3L, Option.empty[String]),                     // all-NULL RHS → clean
      (4L, Option("a")), (4L, Option.empty[String])   // value + NULL → violation
    ).toDF("k", "v")
    val got = Profiling.fdViolations(d, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === Set(2L, 4L))
    assert(got(2L) === ((2L, 2L, 0L)))
    assert(got(4L) === ((2L, 1L, 1L)))
  }

  test("keyConcentration: hand-checked HHI for uniform, single, skewed keys") {
    import spark.implicits._
    def hhi(rows: Seq[String]): (Long, Long, Long, Long) =
      Profiling.keyConcentration(rows.toDF("k"), Seq("k"))
        .as[(Long, Long, Long, Long)].collect().head
    // two uniform keys: (1+1)·10⁶/4 = 500000
    assert(hhi(Seq("a", "b")) === ((2L, 2L, 1L, 500000L)))
    // one key owns everything: 10⁶
    assert(hhi(Seq("a", "a", "a")) === ((1L, 3L, 3L, 1000000L)))
    // whale: (98² + 1 + 1)·10⁶/100² = 960600
    assert(hhi(Seq.fill(98)("a") ++ Seq("b", "c")) === ((3L, 100L, 98L, 960600L)))
  }

  test("columnEntropy: constant ≈ 0, uniform = quantized ln k, NULLs apart") {
    import spark.implicits._
    def ent(vals: Seq[Option[String]]): (Long, Long, Long, Long) =
      Profiling.columnEntropy(vals.toDF("v"), "v")
        .as[(Long, Long, Long, Long)].collect().head
    assert(ent(Seq.fill(10)(Option("x"))) === ((1L, 10L, 0L, 0L)))
    // uniform over 4: 4 · ⌊10⁶·(1/4)·ln 4⌋
    val q4 = math.floor(1000000.0 * 0.25 * math.log(4.0)).toLong
    assert(ent(Seq("a", "b", "c", "d").map(Option(_))) === ((4L, 4L, 0L, 4 * q4)))
    // NULLs excluded from the distribution, counted separately
    assert(ent(Seq(Option("x"), Option("x"), Option.empty[String]))
      === ((1L, 2L, 1L, 0L)))
    // all-NULL edge: zero-entropy empty distribution, not a NULL row
    assert(ent(Seq(Option.empty[String])) === ((0L, 0L, 1L, 0L)))
  }

  test("fkOrphans: orphan rows/keys counted, NULL child keys reported apart") {
    import spark.implicits._
    val child = Seq(Option(1L), Option(1L), Option(2L), Option(9L), Option.empty[Long])
      .toDF("k")
    val parent = Seq(1L, 3L).toDF("p")
    val r = Profiling.fkOrphans(child, parent, "k", "p")
      .as[(Long, Long, Long, Long)].collect().head
    // 5 child rows, 1 NULL key, orphans: 2 and 9 → 2 rows over 2 keys
    assert(r === ((5L, 1L, 2L, 2L)))
  }

  test("fkOrphans: a satisfied FK reports zero orphans") {
    import spark.implicits._
    val child = (1 to 50).map(i => i.toLong % 5).toDF("k")
    val parent = (0 to 4).map(_.toLong).toDF("p")
    val r = Profiling.fkOrphans(child, parent, "k", "p")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r === ((50L, 0L, 0L, 0L)))
  }

  test("fdViolations: a held dependency returns no rows") {
    import spark.implicits._
    val d = (1 to 100).map(i => (i.toLong % 10, s"v${i % 10}")).toDF("k", "v")
    assert(Profiling.fdViolations(d, Seq("k"), "v").count() === 0L)
  }

  test("fdViolations plan: both exchanges are fed by partial aggregates") {
    import spark.implicits._
    val d = Seq((1L, "a")).toDF("k", "v")
    val plan = Profiling.fdViolations(d, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial"))
  }
}
