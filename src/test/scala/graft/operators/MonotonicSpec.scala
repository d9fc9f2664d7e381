package graft.operators

import graft.SparkSpec

/** Monotonicity audit: inversion counting, worst drop, first offender,
  * clean-key absence.
  */
class MonotonicSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: two inversions, worst drop, first offending position") {
    // key 7 ordered by o: values 10, 5 (drop 5), 8, 2 (drop 6), 9
    val df = Seq(
      (7L, 1L, 10L), (7L, 2L, 5L), (7L, 3L, 8L), (7L, 4L, 2L), (7L, 5L, 9L),
      (8L, 1L, 1L), (8L, 2L, 2L))
      .toDF("k", "o", "v")
    val got = Monotonic.inversions(df, "k", "o", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // key 8 is clean and absent
    assert(got.toSeq == Seq((7L, 4L, 2L, 6L, 2L)))
  }

  test("equal adjacent values are NOT inversions; NULLs drop") {
    val df = Seq(
      (Some(1L), Some(1L), Some(5L)), (Some(1L), Some(2L), Some(5L)),
      (Some(1L), None, Some(9L)), (Some(1L), Some(3L), None))
      .toDF("k", "o", "v")
    assert(Monotonic.inversions(df, "k", "o", "v").count() == 0L)
  }
}
