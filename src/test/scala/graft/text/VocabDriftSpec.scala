package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Vocab-drift contracts: bounded bucket space, OOV absorption, identical
  * slices drift to zero, deterministic vocabulary cut, plan shape.
  */
class VocabDriftSpec extends SparkSpec {

  import spark.implicits._

  private def df(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("identical slices: every occupied bucket has psi_q == 0") {
    val a = df("x y x z", "y y x")
    val rows = VocabDrift.vocabDrift(a, a, "text", vocabSize = 2).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) == 0L, r.toString))
  }

  test("bucket space is top-V of the REFERENCE plus <oov>") {
    val ref = df("a a a b b c") // top-2 = {a, b}; c -> oov
    val cur = df("a c c d")     // c, d -> oov on the ref vocabulary
    val got = VocabDrift.vocabDrift(ref, cur, "text", vocabSize = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set("a", "b", VocabDrift.Oov))
    assert(got("a") == ((3L, 1L)))
    assert(got("b") == ((2L, 0L)))
    assert(got(VocabDrift.Oov) == ((1L, 3L))) // ref c; cur c c d
  }

  test("a one-sided bucket has NULL psi (ln undefined), the Drift contract") {
    val ref = df("a a b")
    val cur = df("a a a")
    val got = VocabDrift.vocabDrift(ref, cur, "text", vocabSize = 5)
      .collect().map(r => r.getString(0) -> Option(r.get(3))).toMap
    assert(got("b").isEmpty)     // cur-side empty
    assert(got("a").nonEmpty)
  }

  test("vocabulary ties cut deterministically (count desc, token asc)") {
    val ref = df("b a c a b c") // all count 2: vocab of 2 = {a, b}
    val got = VocabDrift.vocabDrift(ref, ref, "text", vocabSize = 2)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a", "b", VocabDrift.Oov))
  }

  test("plan: vocabulary broadcasts; word counts partial-agg'd") {
    val plan = VocabDrift.vocabDrift(df("a b"), df("b c"), "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial count"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
