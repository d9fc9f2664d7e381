package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL overlap: identical/disjoint/empty cohort anchors, the
  * inclusion–exclusion identity, merge-vs-rebuild equivalence, slice
  * consistency with the plain estimator, label exclusion.
  */
class HllOverlapSpec extends SparkSpec {

  import spark.implicits._

  private def cohortDf(aN: Int, bN: Int, bOffset: Int) = {
    val a = (1 to aN).map(i => ("g", "a", i.toLong))
    val b = (1 to bN).map(i => ("g", "b", (i + bOffset).toLong))
    (a ++ b).toDF("grp", "cohort", "v")
  }

  test("identical cohorts: est_a = est_b = est_union, overlap = est_a") {
    val df = cohortDf(500, 500, 0)
    val r = HllOverlap.overlap(df, Seq("grp"), "v", "cohort", "a", "b").head()
    assert(r.getLong(1) == r.getLong(2) && r.getLong(2) == r.getLong(3))
    assert(r.getLong(4) == r.getLong(1))
  }

  test("disjoint cohorts: near-zero overlap, estimates near truth") {
    val df = cohortDf(400, 400, 1000)
    val r = HllOverlap.overlap(df, Seq("grp"), "v", "cohort", "a", "b").head()
    assert(math.abs(r.getLong(1) - 400L) <= 20L)
    assert(math.abs(r.getLong(2) - 400L) <= 20L)
    assert(math.abs(r.getLong(4)) <= 30L) // truth 0, sketch noise allowed
    assert(r.getLong(4) == r.getLong(1) + r.getLong(2) - r.getLong(3))
  }

  test("half overlap lands near truth") {
    // a = 1..400, b = 201..600: true overlap 200
    val df = cohortDf(400, 400, 200)
    val r = HllOverlap.overlap(df, Seq("grp"), "v", "cohort", "a", "b").head()
    assert(math.abs(r.getLong(4) - 200L) <= 40L)
  }

  test("an empty cohort publishes est 0 and overlap exactly 0") {
    val df = (1 to 300).map(i => ("g", "a", i.toLong)).toDF("grp", "cohort", "v")
    val r = HllOverlap.overlap(df, Seq("grp"), "v", "cohort", "a", "b").head()
    assert(r.getLong(2) == 0L)
    assert(r.getLong(1) == r.getLong(3)) // union IS cohort a
    assert(r.getLong(4) == 0L)
  }

  test("rows with other labels are excluded (declared)") {
    val df = cohortDf(200, 200, 0)
      .unionByName(Seq(("g", "c", 99999L)).toDF("grp", "cohort", "v"))
    val withC = HllOverlap.overlap(df, Seq("grp"), "v", "cohort", "a", "b").head()
    val without = HllOverlap.overlap(cohortDf(200, 200, 0),
      Seq("grp"), "v", "cohort", "a", "b").head()
    assert(withC.getLong(3) == without.getLong(3))
  }

  test("union estimate == plain estimator over the combined rows (max-merge law)") {
    val df = cohortDf(350, 350, 100)
    val r = HllOverlap.overlap(df, Seq("grp"), "v", "cohort", "a", "b").head()
    val direct = HllDistinct.estimate(df, Seq("grp"), "v").head()
    assert(r.getLong(3) == direct.getLong(2))
    val sliceA = HllDistinct.estimate(
      df.where(col("cohort") === "a"), Seq("grp"), "v").head()
    assert(r.getLong(1) == sliceA.getLong(2))
  }

  test("groups are independent strata") {
    val df = cohortDf(100, 100, 50)
      .unionByName((1 to 80).map(i => ("h", "a", i.toLong))
        .toDF("grp", "cohort", "v"))
    val got = HllOverlap.overlap(df, Seq("grp"), "v", "cohort", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("g", "h"))
    assert(got("h").getLong(2) == 0L && got("h").getLong(4) == 0L)
  }
}
