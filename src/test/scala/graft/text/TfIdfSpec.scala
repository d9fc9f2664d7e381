package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Score math + top-k semantics on a hand-computable corpus, and the plan
  * contract: the df join-back must broadcast.
  */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs, 'a' everywhere, 'b' in two, 'c' in one (twice)
  private lazy val docs = Seq(
    (1L, "a b"), (2L, "a b"), (3L, "a c c")
  ).toDF("doc_id", "text")

  test("tf/df/n and the smoothed score") {
    val got = TfIdf.tfIdf(docs).orderBy("doc_id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    def score(tf: Long, df: Long) = tf * (math.log(4.0 / (df + 1.0)) + 1.0)
    assert(got.toSeq === Seq(
      (1L, "a", 1L, 3L, 3L, score(1, 3)),
      (1L, "b", 1L, 2L, 3L, score(1, 2)),
      (2L, "a", 1L, 3L, 3L, score(1, 3)),
      (2L, "b", 1L, 2L, 3L, score(1, 2)),
      (3L, "a", 1L, 3L, 3L, score(1, 3)),
      (3L, "c", 2L, 1L, 3L, score(2, 1))))
  }

  test("topTerms keeps the k best per doc with lexicographic tiebreak") {
    val top = TfIdf.topTerms(docs, k = 1).select("doc_id", "term")
      .as[(Long, String)].collect().toSet
    // doc 1/2: b (rarer) beats a; doc 3: c (tf=2, df=1)
    assert(top === Set((1L, "b"), (2L, "b"), (3L, "c")))
  }

  test("df join-back is a broadcast join") {
    val plan = TfIdf.tfIdf(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"df join not broadcast:\n$plan")
  }
}
