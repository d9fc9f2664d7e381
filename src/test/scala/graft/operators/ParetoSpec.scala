package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ABC classification: hand-checked bands, whale-first-item rule, tie
  * determinism, share arithmetic, contracts.
  */
class ParetoSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked bands at 80/95") {
    // values 50, 30, 15, 4, 1 (total 100): prefix-before shares
    // 0, 50, 80, 95, 99 → A, A, B(80 not < 80), C(95 not < 95), C
    val df = Seq(("g", 1L, 50L), ("g", 2L, 30L), ("g", 3L, 15L),
      ("g", 4L, 4L), ("g", 5L, 1L)).toDF("grp", "id", "v")
    val got = Pareto.abcClassify(df, "grp", "id", "v")
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(got(1L) == ((1L, 5000L, "A")))
    assert(got(2L) == ((2L, 8000L, "A")))
    assert(got(3L) == ((3L, 9500L, "B")))
    assert(got(4L) == ((4L, 9900L, "C")))
    assert(got(5L) == ((5L, 10000L, "C")))
  }

  test("a 99%-of-total whale is class A (exclusive-prefix banding)") {
    val df = Seq(("g", 1L, 99L), ("g", 2L, 1L)).toDF("grp", "id", "v")
    val got = Pareto.abcClassify(df, "grp", "id", "v")
      .collect().map(r => r.getLong(1) -> r.getString(5)).toMap
    assert(got == Map(1L -> "A", 2L -> "C"))
  }

  test("ties rank by id; zero/negative/NULL values drop") {
    val df = Seq(("g", 3L, Some(10L)), ("g", 1L, Some(10L)),
      ("g", 9L, Some(0L)), ("g", 8L, Some(-5L)), ("g", 7L, None))
      .toDF("grp", "id", "v")
    val got = Pareto.abcClassify(df, "grp", "id", "v")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSet == Set((1L, 1L), (3L, 2L)), s"got ${got.toSeq}")
  }
}
