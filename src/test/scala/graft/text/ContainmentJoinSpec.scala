package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Containment-join contracts: the quote-in-page case Jaccard misses,
  * threshold exactness, equal-size pairs, and the no-cartesian plan.
  */
class ContainmentJoinSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame,
                    num: Long, den: Long) =
    ContainmentJoin.selfJoin(df, "doc_id", "text", n = 3, minNum = num, minDen = den)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

  test("a short quote inside a long page: containment finds it, Jaccard does not") {
    val quote = "the five boxing wizards jump quickly at dawn"
    val page = ("unrelated filler words across many tokens " * 8) + quote +
      " and then much more trailing content follows here to the end"
    val df = Seq((1L, quote), (2L, page)).toDF("doc_id", "text")
    val got = pairs(df, 9, 10)
    assert(got.contains((1L, 2L)), s"containment pair missing: $got")
    // the same pair fails a Jaccard-1/2 join (tiny overlap fraction of the page)
    val jac = JaccardJoin.selfJoin(df, "doc_id", "text", n = 3)
      .collect()
    assert(jac.isEmpty)
  }

  test("threshold is exact: inter/min below tau excluded, at tau included") {
    // A: 4 trigrams (6 tokens: a b c d e f -> abc bcd cde def)
    // B shares exactly 3 of them plus noise -> containment 3/4
    val a = "a b c d e f"
    val b = "a b c d e x y z w v u t"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    assert(pairs(df, 3, 4).contains((1L, 2L)))  // 3/4 >= 3/4
    assert(!pairs(df, 4, 5).contains((1L, 2L))) // 3/4 < 4/5
  }

  test("equal-size identical docs reach containment 1") {
    val df = Seq((1L, "p q r s t u"), (2L, "p q r s t u")).toDF("doc_id", "text")
    val got = pairs(df, 1, 1)
    assert(got((1L, 2L))._1 == got((1L, 2L))._2)
  }

  test("dropContained removes the quote, keeps the page; chains drop in one pass") {
    val quote = "the five boxing wizards jump quickly at dawn"
    val page = ("filler words here across quite many tokens " * 8) + quote +
      " and then much more trailing content follows to the end"
    val df = Seq((1L, quote), (2L, page), (3L, "fully unrelated text about joins"))
      .toDF("doc_id", "text")
    val kept = ContainmentJoin.dropContained(df, "doc_id", "text", n = 3,
        minNum = 9, minDen = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("non-integral id column fails loudly (never a silent empty result)") {
    val df = Seq(("d1", "a b c d"), ("d2", "a b c d e f")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      ContainmentJoin.selfJoin(df, "doc_id", "text")
    }
    assert(e.getMessage.contains("integral id column"))
    val e2 = intercept[IllegalArgumentException] {
      ContainmentJoin.dropContainedIterate(df, "doc_id", "text")
    }
    assert(e2.getMessage.contains("integral id column"))
  }

  test("maxDf cut: stopword shingle drops from candidates, pairs unchanged") {
    // token "the" appears in every doc (df = 10); real signal x/y/z is rare
    val quote = "x y z the"
    val page = "x y z the p q r s t u v w"
    val fillers = (3L to 10L).map(i => (i, s"the filler$i"))
    val df = (Seq((1L, quote), (2L, page)) ++ fillers).toDF("doc_id", "text")
    def run(cap: Long) =
      ContainmentJoin.selfJoin(df, "doc_id", "text", n = 1,
          minNum = 3, minDen = 4, maxDf = cap)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run(Long.MaxValue)
    assert(uncapped.contains((1L, 2L)))
    // cap cuts "the" (df 10 > 5) from both candidate sides; every doc's
    // dropped count (1) stays under its need, so the cut is lossless
    assert(run(5L) == uncapped)
    assert(ContainmentJoin.prefixOverflow(df, "doc_id", "text", n = 1,
      minNum = 3, minDen = 4, maxDf = 5L).isEmpty)
  }

  test("prefixOverflow flags a doc whose shingles are all ubiquitous") {
    // doc 11 is ONLY the stopword: kept = 0, dropped = 1 >= need = 1
    val docs = (1L to 10L).map(i => (i, s"the word$i")) :+ (11L, "the")
    val df = docs.toDF("doc_id", "text")
    val flagged = ContainmentJoin.prefixOverflow(df, "doc_id", "text", n = 1,
        minNum = 3, minDen = 4, maxDf = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(flagged.toSeq == Seq((11L, 1L, 1L)),
      s"only the all-stopword doc overflows: ${flagged.toSeq}")
  }

  test("dropContainedIterate: chain A⊂B⊂C keeps A when (A,C) is below tau") {
    // n = 1 (shingles = tokens), tau = 2/3:
    //   A = {a,b,c}           contained in B (|A∩B| = 2 >= ceil(2*3/3) = 2)
    //   B = {a,b,d,e,f,g}     contained in C (|B∩C| = 4 >= ceil(2*6/3) = 4)
    //   A vs C: overlap 0 -> no pair
    val df = Seq(
      (1L, "a b c"),
      (2L, "a b d e f g"),
      (3L, "d e f g h i j k")).toDF("doc_id", "text")
    // one-pass policy drops BOTH A and B (the documented caveat)
    val onePass = ContainmentJoin.dropContained(df, "doc_id", "text", n = 1,
        minNum = 2, minDen = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(onePass == Set(3L))
    // fixpoint keeps A: its container B died, and A is NOT in C at tau
    val iterated = ContainmentJoin.dropContainedIterate(df, "doc_id", "text",
        n = 1, minNum = 2, minDen = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(iterated == Set(1L, 3L),
      s"every dropped doc must have a SURVIVING container: $iterated")
  }

  test("dropContainedIterate at tau=1 matches dropContained on a strict chain") {
    // A ⊆ B ⊆ C exactly: one pass and the fixpoint agree (only C survives)
    val df = Seq(
      (1L, "a b"),
      (2L, "a b c d"),
      (3L, "a b c d e f")).toDF("doc_id", "text")
    val iterated = ContainmentJoin.dropContainedIterate(df, "doc_id", "text",
        n = 1, minNum = 1, minDen = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(iterated == Set(3L))
  }

  test("plan: no cartesian; candidates keyed on the shingle fingerprint") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val plan = ContainmentJoin.selfJoin(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
