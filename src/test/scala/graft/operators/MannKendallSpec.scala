package graft.operators

import graft.SparkSpec

/** Mann–Kendall: hand S/var on monotone, tied, and inverted series, a
  * brute-force O(n²) differential, both raises, degenerate and NULL
  * strata, and the codegen pin on the native inversion count.
  */
class MannKendallSpec extends SparkSpec {

  import spark.implicits._

  test("strictly increasing series: S = n(n-1)/2, exact tie-free var18") {
    val df = (1L to 5L).map(i => ("g", i, i * 10L)).toDF("grp", "i", "v")
    val r = MannKendall.trend(df, "grp", "i", "v").head()
    assert(r.getLong(1) == 5L)
    assert(r.getLong(2) == 10L)      // all 10 pairs concordant
    assert(r.getLong(3) == 0L)       // no ties
    assert(r.getLong(4) == 300L)     // 5*4*15
  }

  test("strictly decreasing series mirrors to S = -n(n-1)/2") {
    val df = (1L to 5L).map(i => ("g", i, -i * 10L)).toDF("grp", "i", "v")
    assert(MannKendall.trend(df, "grp", "i", "v").head().getLong(2) == -10L)
  }

  test("ties: hand-checked S, tie_pairs, and the variance tie term") {
    // values 1,2,2,3 in time order: S = 5, one tied pair,
    // var18 = 4*3*13 - 2*1*9 = 138
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 2L), ("g", 4L, 3L))
      .toDF("grp", "i", "v")
    val r = MannKendall.trend(df, "grp", "i", "v").head()
    assert(r.getLong(2) == 5L && r.getLong(3) == 1L && r.getLong(4) == 138L)
  }

  test("inversions count descending pairs: 3,1,2 gives S = -1") {
    val df = Seq(("g", 1L, 3L), ("g", 2L, 1L), ("g", 3L, 2L))
      .toDF("grp", "i", "v")
    assert(MannKendall.trend(df, "grp", "i", "v").head().getLong(2) == -1L)
  }

  test("row order into the operator is irrelevant (sorts on idx)") {
    val df = Seq(("g", 3L, 2L), ("g", 1L, 3L), ("g", 2L, 1L))
      .toDF("grp", "i", "v")
    assert(MannKendall.trend(df, "grp", "i", "v").head().getLong(2) == -1L)
  }

  test("brute-force differential on a deterministic 200-point series") {
    val vals = (0 until 200).map(i => ((i * 2654435761L) % 1000L) % 37L)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("grp", "i", "v")
    val r = MannKendall.trend(df, "grp", "i", "v").head()
    var s = 0L
    for (i <- vals.indices; j <- (i + 1) until vals.length)
      s += java.lang.Long.signum(vals(j) - vals(i))
    assert(r.getLong(2) == s)
    val tieTerm = vals.groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) * (2L * g.size + 5)).sum
    assert(r.getLong(4) == 200L * 199L * 405L - tieTerm)
  }

  test("whale groups and duplicate indexes raise in-plan") {
    val big = (1L to 11L).map(i => ("g", i, i)).toDF("grp", "i", "v")
    val e1 = intercept[Exception] {
      MannKendall.trend(big, "grp", "i", "v", maxPoints = 10L).collect()
    }
    assert(e1.getMessage.contains("points"))
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("grp", "i", "v")
    val e2 = intercept[Exception] {
      MannKendall.trend(dup, "grp", "i", "v").collect()
    }
    assert(e2.getMessage.contains("duplicate idx"))
  }

  test("a single-point group reports S = 0 with NULL var18; NULL stratum real") {
    val df = Seq((Some("g"), Some(1L), Some(5L)),
      (None, Some(1L), Some(1L)), (None, Some(2L), Some(2L)),
      (Some("g"), None, Some(9L))).toDF("grp", "i", "v")
    val got = MannKendall.trend(df, "grp", "i", "v").collect()
    assert(got.length == 2)
    val g = got.find(!_.isNullAt(0)).get
    assert(g.getLong(1) == 1L && g.getLong(2) == 0L && g.isNullAt(4))
    assert(got.find(_.isNullAt(0)).get.getLong(2) == 1L)
  }

  test("the inversion count runs inside whole-stage codegen") {
    import org.apache.spark.sql.functions.{array, col, expr}
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .select(array(col("o_orderkey"),
        expr("CAST(o_custkey AS BIGINT)")).as("arr"))
    val plan = df.select(graft.functions.InversionCount(col("arr")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
  }
}
