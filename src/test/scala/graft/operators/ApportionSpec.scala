package graft.operators

import graft.SparkSpec

/** Largest remainder: hand quotas, deterministic remainder ties, exact
  * total invariant, zero-weight and guard contracts.
  */
class ApportionSpec extends SparkSpec {

  import spark.implicits._

  test("hand quotas: the biggest remainder takes the leftover slot") {
    val df = Seq(("a", 5L), ("b", 3L), ("c", 3L)).toDF("g", "w")
    val got = Apportion.largestRemainder(df, "g", "w", total = 4)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("seats")))
    // bases 1,1,1; remainders 9,1,1 -> a gets the extra
    assert(got.toSeq == Seq(("a", 2L), ("b", 1L), ("c", 1L)))
  }

  test("remainder ties break by group ascending, never arbitrarily") {
    val df = Seq(("c", 3L), ("b", 3L), ("a", 2L)).toDF("g", "w")
    val got = Apportion.largestRemainder(df, "g", "w", total = 4)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("seats")))
    // bases 1,1,1; rems a=0, b=4, c=4 -> the single extra goes to b
    assert(got.toSeq == Seq(("a", 1L), ("b", 2L), ("c", 1L)))
  }

  test("the allocation always sums exactly to N") {
    val df = Seq(("a", 17L), ("b", 5L), ("c", 13L), ("d", 1L), ("e", 64L))
      .toDF("g", "w")
    for (n <- Seq(0L, 1L, 7L, 100L, 999L)) {
      val s = Apportion.largestRemainder(df, "g", "w", n)
        .agg(org.apache.spark.sql.functions.sum("seats")).head().getLong(0)
      assert(s == n, s"n=$n got=$s")
    }
  }

  test("zero-weight groups can win nothing; W=0 and negatives raise") {
    val df = Seq(("a", 0L), ("b", 10L)).toDF("g", "w")
    val got = Apportion.largestRemainder(df, "g", "w", 3)
      .orderBy("g").collect().map(_.getAs[Long]("seats"))
    assert(got.toSeq == Seq(0L, 3L))
    intercept[Exception] {
      Apportion.largestRemainder(
        Seq(("a", 0L)).toDF("g", "w"), "g", "w", 3).collect()
    }
    val e = intercept[Exception] {
      Apportion.largestRemainder(
        Seq(("a", -1L), ("b", 5L)).toDF("g", "w"), "g", "w", 3).collect()
    }
    assert(e.getMessage.contains("negative weight"))
  }
}
