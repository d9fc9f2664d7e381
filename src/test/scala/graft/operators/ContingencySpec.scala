package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact chi-square: hand-checked 2×2 table, independence → zero,
  * partitioning independence, dof.
  */
class ContingencySpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked 2x2 table") {
    // classic example: o = [[10, 20], [30, 40]]; T=100, r=(30,70), c=(40,60)
    // e = [[12,18],[28,42]]; chi2 = 4/12 + 4/18 + 4/28 + 4/42 = 0.7936507...
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = Contingency.chiSquare(rows.toDF("u", "v"), "u", "v")
      .head()
    // direct quantized computation: (o*T - r*c)^2 * S div (T*r*c)
    def q(o: Long, r: Long, c: Long): Long = {
      val d = o * 100 - r * c
      d * d * 1000000L / (100L * r * c)
    }
    val want = q(10, 30, 40) + q(20, 30, 60) + q(30, 70, 40) + q(40, 70, 60)
    assert(got.getLong(0) === want)
    assert(got.getLong(1) === 1L) // (2-1)*(2-1)
    // and the quantized statistic matches the float value to 1e-6 per cell
    assert(math.abs(got.getLong(0) / 1e6 - 0.79365) < 1e-3)
  }

  test("perfect independence gives exactly zero") {
    // o proportional to r*c in every cell
    val rows =
      Seq.fill(8)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(32)(("b", "x")) ++ Seq.fill(8)(("b", "y"))
    val got = Contingency.chiSquare(rows.toDF("u", "v"), "u", "v").head()
    assert(got.getLong(0) === 0L)
  }

  test("partitioning-independent") {
    val rows = (1 to 400).map(i => (s"a${i % 3}", s"b${i % 5}", i))
    val one = Contingency.cells(rows.toDF("u", "v", "i").repartition(1), "u", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val many = Contingency.cells(rows.toDF("u", "v", "i").repartition(13), "u", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(one === many && one.size === 15)
  }
  test("mutual information: hand-checked 2x2 and independence -> all-zero cells") {
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = Contingency.mutualInfoCells(rows.toDF("u", "v"), "u", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    def mi(o: Double, r: Double, c: Double): Long =
      math.floor(1e6 * (o / 100.0) * math.log(o * 100.0 / (r * c))).toLong
    assert(got(("a", "x")) == ((10L, mi(10, 30, 40))))
    assert(got(("b", "y")) == ((40L, mi(40, 70, 60))))
    // total MI positive for a dependent table
    assert(got.values.map(_._2).sum > 0)
    // independent table: every cell's ratio is exactly 1 -> ln 1 = 0
    val ind = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val z = Contingency.mutualInfoCells(ind.toDF("u", "v"), "u", "v")
      .collect().map(_.getLong(3))
    assert(z.forall(_ == 0L))
  }

  test("miMatrix: identical columns maximize MI, independent ones are ~0") {
    import spark.implicits._
    // b == a (perfect dependence); c independent of a by construction
    val df = (0 until 400).map(i => (i % 4, i % 4, i % 2))
      .toDF("a", "b", "z")
    val got = Contingency.miMatrix(df, Seq("a", "b", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // a↔b: MI = ln(4) ≈ 1.386 → quantized ~1386294 minus per-cell floors
    val (abCells, abMi) = got(("a", "b"))
    assert(abCells == 4L)
    assert(abMi > 1380000L && abMi <= 1386295L, s"ab MI $abMi")
    // a↔z: build a truly independent second axis
    val df2 = (0 until 400).map(i => (i % 4, (i / 4) % 2)).toDF("a", "z")
    val (acCells, acMi) = Contingency.miMatrix(df2, Seq("a", "z"))
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(acCells == 8L)
    // exact independence: every cell term is ln(1) = 0, floors make it
    // at most 0 and no lower than -cells (each term floors to 0 or -1)
    assert(acMi <= 0L && acMi >= -8L, s"independent MI $acMi")
  }

  test("cramersV: perfect association ≈ full scale, independence ≈ 0, degenerate NULL") {
    import spark.implicits._
    val perfect = (0 until 300).map(i => (i % 3, i % 3)).toDF("a", "b")
    val rp = Contingency.cramersV(perfect, "a", "b").collect().head
    val v2p = rp.getAs[Long]("v2_q6")
    assert(v2p >= 999999L && v2p <= 1000000L, s"perfect V² $v2p")
    // the unobserved-cell mass is a THIRD of the statistic here — the
    // observed-only convention would report v² = 2/3
    assert(rp.getAs[Long]("chi2_full_q") >= 599999000L)
    assert(rp.getAs[Long]("min_dim") == 2L)
    val indep = (0 until 300).map(i => (i % 3, (i / 3) % 2)).toDF("a", "b")
    val ri = Contingency.cramersV(indep, "a", "b").collect().head
    assert(ri.getAs[Long]("v2_q6") == 0L, "independent V² must be 0")
    val degen = (0 until 10).map(i => (1, i % 2)).toDF("a", "b")
    val rd = Contingency.cramersV(degen, "a", "b").collect().head
    assert(rd.isNullAt(rd.fieldIndex("v2_q6")), "single-category axis must be NULL")
  }
}
