package graft.operators

import graft.SparkSpec

/** Stratified ATE: hand fractions, a Simpson's-reversal case the
  * pooling resists, one-armed strata excluded with honest counts,
  * sign-split truncation, the 0/1 raise, NULL strata.
  */
class StratifiedAteSpec extends SparkSpec {

  import spark.implicits._

  private def rows(spec: (String, Int, Long, Int)*): org.apache.spark.sql.DataFrame =
    spec.flatMap { case (g, t, y, n) => Seq.fill(n)((g, t.toLong, y)) }
      .toDF("grp", "t", "y")

  test("hand per-stratum fractions and the size-weighted pool") {
    // s1: treat mean 30 (n2), ctrl mean 10 (n2): diff 20
    // s2: treat mean 5 (n1), ctrl mean 10 (n3): diff -5
    val df = rows(("s1", 1, 30L, 2), ("s1", 0, 10L, 2),
      ("s2", 1, 5L, 1), ("s2", 0, 10L, 3))
    val by = StratifiedAte.byStratum(df, "grp", "t", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(by("s1").getLong(7) == 20000000L)
    assert(by("s2").getLong(7) == -5000000L)
    val p = StratifiedAte.pooled(df, "grp", "t", "y").head()
    // pool: (4*20 + 4*(-5)) * 1e6 / 8 = 60/8 = 7.5
    assert(p.getLong(0) == 2L && p.getLong(1) == 0L && p.getLong(2) == 8L)
    assert(p.getLong(3) == 4L * 20000000L - 4L * 5000000L)
    assert(p.getLong(4) == 8L)
  }

  test("pooling resists Simpson's reversal") {
    // within both strata treatment ADDS exactly 10; naive pooled means
    // reverse because treatment concentrates in the low-outcome stratum
    val df = rows(("lo", 1, 10L, 90), ("lo", 0, 0L, 10),
      ("hi", 1, 110L, 10), ("hi", 0, 100L, 90))
    val p = StratifiedAte.pooled(df, "grp", "t", "y").head()
    // every stratum diff is exactly +10 -> pooled = 10 with zero slack
    assert(p.getLong(3) == 10000000L * p.getLong(4))
    val naive = StratifiedAte.byStratum(
      df.withColumn("grp", org.apache.spark.sql.functions.lit("all")),
      "grp", "t", "y").head()
    assert(naive.getLong(7) < 0L) // the trap: naive says treatment hurts
  }

  test("one-armed strata publish NULL and drop from the pool, counted") {
    val df = rows(("s1", 1, 10L, 2), ("s1", 0, 5L, 2), ("s2", 1, 99L, 3))
    val by = StratifiedAte.byStratum(df, "grp", "t", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(by("s2").isNullAt(7))
    val p = StratifiedAte.pooled(df, "grp", "t", "y").head()
    assert(p.getLong(0) == 1L && p.getLong(1) == 1L && p.getLong(2) == 4L)
  }

  test("negative effects truncate sign-split (toward zero)") {
    // treat mean 0 (n=3), ctrl holds one 7 among three rows: mean 7/3;
    // diff = -7/3 -> q6 = -2333333 (toward zero), not floor's -2333334
    val df = rows(("g", 1, 0L, 3), ("g", 0, 7L, 1), ("g", 0, 0L, 2))
    val r = StratifiedAte.byStratum(df, "grp", "t", "y").head()
    assert(r.getLong(7) == -2333333L)
  }

  test("non-0/1 treatment raises; NULL strata are real") {
    val e = intercept[Exception] {
      StratifiedAte.byStratum(Seq(("g", 2L, 1L)).toDF("grp", "t", "y"),
        "grp", "t", "y").collect()
    }
    assert(e.getMessage.contains("must be 0/1"))
    val df = Seq((Some("g"), 1L, 1L), (Some("g"), 0L, 0L),
      (None, 1L, 5L), (None, 0L, 1L)).toDF("grp", "t", "y")
    val got = StratifiedAte.byStratum(df, "grp", "t", "y").collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }

  test("a fully-filtered input pools to honest zeros (r10 fix)") {
    val df = Seq((Some("g"), None: Option[Long], Some(1L)))
      .toDF("grp", "t", "y")
    val p = StratifiedAte.pooled(df, "grp", "t", "y").head()
    assert(p.getLong(0) == 0L && p.getLong(1) == 0L && p.getLong(2) == 0L)
    assert(p.isNullAt(3))
  }
}
