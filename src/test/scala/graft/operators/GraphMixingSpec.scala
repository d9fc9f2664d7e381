package graft.operators

import graft.SparkSpec

/** Graph mixing: hand moment algebra, perfect assortativity, negative
  * sign, reciprocity, dedup/self-loop/NULL contracts, empty graph.
  */
class GraphMixingSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: moments, zero covariance, half reciprocity") {
    // a→b, a→c, b→c, c→a: cov = 0, varj = vark = 4, recip pair (a,c)/(c,a)
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val r = GraphMixing.summary(e, "s", "d").collect().head
    assert(r.getAs[Long]("m") == 4L)
    assert(r.getAs[Long]("recip_edges") == 2L)
    assert(r.getAs[Long]("reciprocity_q6") == 500000L)
    assert(r.getAs[Long]("cov") == 0L)
    assert(r.getAs[Long]("varj") == 4L)
    assert(r.getAs[Long]("vark") == 4L)
    assert(r.getAs[Long]("r2s_q6") == 0L)
  }

  test("perfectly assortative two-regular-components graph scores +1.0") {
    // 1-regular component {a→b} + 2-regular component {c,f}→{d,e}
    val e = Seq(("a", "b"), ("c", "d"), ("c", "e"), ("f", "d"), ("f", "e"))
      .toDF("s", "d")
    val r = GraphMixing.summary(e, "s", "d").collect().head
    assert(r.getAs[Long]("cov") == 4L)
    assert(r.getAs[Long]("varj") == 4L)
    assert(r.getAs[Long]("vark") == 4L)
    assert(r.getAs[Long]("r2s_q6") == 1000000L)
    assert(r.getAs[Long]("recip_edges") == 0L)
    assert(r.getAs[Long]("reciprocity_q6") == 0L)
  }

  test("disassortative motif: negative sign; two-step truncation is the declared quantization") {
    // K disjoint copies of {h→l1, h→l2, l1→l2}: cov = −K², varj = vark = 2K²
    def motif(k: Int) = (0 until k).flatMap(i =>
      Seq((s"h$i", s"a$i"), (s"h$i", s"b$i"), (s"a$i", s"b$i"))).toDF("s", "d")
    // K=1: cov² div varj = 1 div 2 = 0 — the declared small-value slack
    val r1 = GraphMixing.summary(motif(1), "s", "d").collect().head
    assert(r1.getAs[Long]("cov") == -1L)
    assert(r1.getAs[Long]("r2s_q6") == 0L)
    // K=10: (10000 div 200)·10⁶ div 200 = 250000, sign −; true r² = 0.25
    val r10 = GraphMixing.summary(motif(10), "s", "d").collect().head
    assert(r10.getAs[Long]("cov") == -100L)
    assert(r10.getAs[Long]("varj") == 200L)
    assert(r10.getAs[Long]("r2s_q6") == -250000L)
  }

  test("duplicate edges collapse; self-loops and NULL endpoints drop; regular graph reports NULL r2s") {
    val e = Seq(Some("a") -> Some("b"), Some("a") -> Some("b"),
      Some("b") -> Some("a"), Some("a") -> Some("a"),
      Option.empty[String] -> Some("b"), Some("a") -> Option.empty[String])
      .map { case (s, d) => (s, d) }.toDF("s", "d")
    val r = GraphMixing.summary(e, "s", "d").collect().head
    assert(r.getAs[Long]("m") == 2L) // a→b, b→a
    assert(r.getAs[Long]("recip_edges") == 2L)
    assert(r.getAs[Long]("reciprocity_q6") == 1000000L)
    // all degrees 1 → both variances 0 → r2s NULL
    assert(r.getAs[Long]("varj") == 0L)
    assert(r.isNullAt(r.fieldIndex("r2s_q6")))
  }

  test("empty graph: m = 0, zero recip, NULL ratios") {
    val e = Seq.empty[(String, String)].toDF("s", "d")
    val r = GraphMixing.summary(e, "s", "d").collect().head
    assert(r.getAs[Long]("m") == 0L)
    assert(r.getAs[Long]("recip_edges") == 0L)
    assert(r.isNullAt(r.fieldIndex("reciprocity_q6")))
    assert(r.isNullAt(r.fieldIndex("cov")))
    assert(r.isNullAt(r.fieldIndex("r2s_q6")))
  }

  test("plan: degree joins and the reciprocity probe are equi-joins — no nested loop beyond the 1-row readout cross join") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "a"), ("a", "c")).toDF("s", "d")
    val plan = GraphMixing.summary(e, "s", "d")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop shape allowed is the declared 1-row x 1-row
    // moments/recip readout join
    val bnl = plan.split("BroadcastNestedLoopJoin").length - 1
    assert(bnl <= 1, plan)
  }
}
