package graft.text

import graft.SparkSpec

/** Overlap-matrix contracts: hand-checked set sizes/intersection/Jaccard,
  * zero-overlap pairs present, within-source duplication collapses, and
  * the fingerprint-keyed join shape.
  */
class SourceOverlapSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: (String, String)*) =
    SourceOverlap.overlapMatrix(
        rows.toSeq.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
          .toDF("doc_id", "src", "text"), "src", "text", shingleN = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("hand-checked: sizes, intersection, quantized jaccard") {
    // a: shingles {a b, b c} ; b: {b c, c d} ; intersection {b c} -> J=1/3
    val got = run(
      ("s1", "a b c"),
      ("s2", "b c d"))
    assert(got(("s1", "s2")) == ((2L, 2L, 1L, 333333L)))
  }

  test("zero-overlap pairs appear with jaccard 0") {
    val got = run(("s1", "a b"), ("s2", "x y"), ("s3", "a b"))
    assert(got(("s1", "s2")) == ((1L, 1L, 0L, 0L)))
    assert(got(("s1", "s3")) == ((1L, 1L, 1L, 1000000L))) // identical sets
    assert(got.size == 3)
  }

  test("within-source duplication does not inflate set sizes") {
    val got = run(("s1", "a b"), ("s1", "a b"), ("s1", "a b"), ("s2", "a b"))
    assert(got(("s1", "s2")) == ((1L, 1L, 1L, 1000000L)))
  }

  test("plan: intersection rides the 8-byte fingerprint equi-join, partial-agg'd distinct") {
    val df = Seq((1L, "s1", "a b c"), (2L, "s2", "b c d")).toDF("doc_id", "src", "text")
    val plan = SourceOverlap.overlapMatrix(df, "src", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__h"), plan) // join keyed on the fingerprint
    assert(plan.contains("partial_count") || plan.contains("partial count"), plan)
  }
}
