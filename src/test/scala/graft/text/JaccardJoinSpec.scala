package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-Jaccard join contracts: brute-force equality (the losslessness of
  * prefix filtering), threshold edge cases, degenerate documents,
  * partitioning independence, and the no-cartesian plan shape.
  */
class JaccardJoinSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox jumps over a lazy dog today"),
      (4L, "completely different text with no shared shingles at all"),
      (5L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (6L, "short one"),                                   // < n tokens
      (7L, "short one"),                                   // dup of 6
      (8L, "the the the the the the the the"),             // low entropy
      (9L, "the the the the the the the cat")
    ).toDF("doc_id", "text")
  }

  /** Brute force over the same shingle sets — the ground truth. */
  private def brute(df: org.apache.spark.sql.DataFrame, n: Int,
                    num: Long, den: Long): Set[(Long, Long)] = {
    val sets = df.select(col("doc_id"),
        TextFunctions.shingleSet(col("text"), n).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      union = sa.size + sb.size - inter
      if inter * den >= num * union
    } yield (ia, ib)).toSet
  }

  private def run(df: org.apache.spark.sql.DataFrame, n: Int,
                  num: Long, den: Long): Set[(Long, Long)] =
    JaccardJoin.selfJoin(df, "doc_id", "text", n, num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("equals brute force on hand data across thresholds and widths") {
    for (n <- Seq(2, 3); (num, den) <- Seq((1L, 2L), (3L, 10L), (9L, 10L), (1L, 1L)))
      assert(run(docsDf, n, num, den) == brute(docsDf, n, num, den),
        s"n=$n tau=$num/$den")
  }

  test("equals brute force on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    assert(run(docs, 3, 1, 2) == brute(docs, 3, 1, 2))
  }

  test("identical documents pair at jaccard exactly 1.0") {
    val out = JaccardJoin.selfJoin(docsDf, "doc_id", "text")
      .where(col("id_a") === 1 && col("id_b") === 5).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
    assert(run(docsDf, 3, 1, 1).contains((6L, 7L)), "short-doc dups must pair")
  }

  test("result is invariant under input partitioning") {
    val a = run(docsDf.repartition(13), 3, 1, 2)
    assert(a == run(docsDf.coalesce(1), 3, 1, 2))
  }

  test("plan: equi-joins only, no cartesian or nested-loop candidate step") {
    val plan = JaccardJoin.selfJoin(docsDf, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("invalid shingle width or threshold is rejected") {
    intercept[IllegalArgumentException](JaccardJoin.selfJoin(docsDf, "doc_id", "text", 0))
    intercept[IllegalArgumentException](
      JaccardJoin.selfJoin(docsDf, "doc_id", "text", 3, 3, 2))
    intercept[IllegalArgumentException](
      JaccardJoin.selfJoin(docsDf, "doc_id", "text", 3, 0, 2))
  }
}
