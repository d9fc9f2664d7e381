package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-score standardization: hand-computed moments, degenerate groups, and
  * the broadcast-moments plan shape.
  */
class OutliersSpec extends SparkSpec {

  import spark.implicits._

  test("z-scores match hand-computed group moments") {
    // group g: values 1..5 → mean 3, var (sumsq/n - mean²) = 11 - 9 = 2
    val df = (1 to 5).map(i => ("g", i.toLong, i.toDouble)).toDF("grp", "id", "v")
    val got = Outliers.zscore(df, "grp", "v", threshold = 1.2)
      .select("id", "z_scaled", "is_outlier")
      .as[(Long, Option[Long], Boolean)].collect()
      .map { case (k, z, f) => k -> ((z.get, f)) }.toMap
    val std = math.sqrt(2.0)
    (1 to 5).foreach { i =>
      val z = (i - 3.0) / std
      assert(got(i.toLong) === (math.floor(z * 1e4).toLong, math.abs(z) > 1.2))
    }
  }

  test("constant group: NULL z, nothing flagged") {
    val df = Seq(("c", 1L, 7.0), ("c", 2L, 7.0)).toDF("grp", "id", "v")
    val got = Outliers.zscore(df, "grp", "v")
      .select("z_scaled", "is_outlier").as[(Option[Long], Boolean)].collect()
    assert(got.forall { case (z, f) => z.isEmpty && !f })
  }

  test("single-row group: variance 0, NULL z") {
    val df = Seq(("s", 1L, 42.0)).toDF("grp", "id", "v")
    val got = Outliers.zscore(df, "grp", "v")
      .select("z_scaled").as[Option[Long]].head()
    assert(got.isEmpty)
  }

  test("groups standardize independently") {
    val df = (Seq(("a", 1L, 0.0), ("a", 2L, 10.0)) ++
      Seq(("b", 3L, 1000.0), ("b", 4L, 3000.0))).toDF("grp", "id", "v")
    val z = Outliers.zscore(df, "grp", "v")
      .select("id", "z_scaled").as[(Long, Option[Long])].collect().toMap
    // both groups are symmetric two-point sets: z = ±1 exactly
    assert(z(1L) === Some(-10000L) && z(2L) === Some(10000L))
    assert(z(3L) === Some(-10000L) && z(4L) === Some(10000L))
  }

  test("plan: moments broadcast back — no second shuffle of row data") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toLong, i.toDouble))
      .toDF("grp", "id", "v")
    val plan = Outliers.zscore(df, "grp", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
