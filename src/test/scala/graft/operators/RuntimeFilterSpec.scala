package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime-filter join: result identity with the plain inner join (incl.
  * null fact keys and an empty dim), and the plan shape — the bloom probe
  * must sit on the fact side BEFORE its exchange, which is the entire
  * point of the operator.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned join equals the plain inner join") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val dim = spark.read.parquet(s"$sf/part.parquet").where(col("p_size") === 15)
    val got = RuntimeFilter.bloomPrunedJoin(lineitem, dim, "l_partkey", "p_partkey", 4096)
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expected = lineitem.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("null fact keys are dropped at the scan, like any inner join") {
    val fact = Seq(Some(1L), None, Some(2L), Some(9L)).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val got = RuntimeFilter.bloomPrunedJoin(fact, dim, "fk", "dk", 16)
      .select("fk").as[Long].collect().sorted
    assert(got === Array(1L, 2L))
  }

  test("empty dim: zero-key bloom rejects everything, join of nothing") {
    val fact = Seq(1L, 2L).toDF("fk")
    val dim = Seq.empty[Long].toDF("dk")
    assert(RuntimeFilter.bloomPrunedJoin(fact, dim, "fk", "dk", 16).count() === 0L)
  }

  test("plan: the bloom probe filters the fact side before its exchange") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val dim = spark.read.parquet(s"$sf/part.parquet").where(col("p_size") === 15)
    val plan = RuntimeFilter
      .bloomPrunedJoin(lineitem, dim, "l_partkey", "p_partkey", 4096)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from physical plan:\n$plan")
    // the probe must be attached to the fact scan stage, i.e. BELOW the
    // join: find the node carrying the probe and assert its subtree scans
    // the fact table and contains no join (so probe-negative rows die
    // before any join machinery, broadcast or shuffled)
    val executed = RuntimeFilter
      .bloomPrunedJoin(lineitem, dim, "l_partkey", "p_partkey", 4096)
      .queryExecution.executedPlan
    def hasProbe(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.expressions.exists(_.find {
        case _: graft.functions.BloomMightContain => true
        case _ => false
      }.isDefined)
    // AQE wrapper nodes (AdaptiveSparkPlanExec / QueryStageExec) expose no
    // children to TreeNode traversal — walk through them explicitly
    def walk(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val below = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: below.flatMap(walk)
    }
    val probeNode = walk(executed).find(hasProbe)
    assert(probeNode.isDefined, "probe expression not found in plan tree")
    val subtree = probeNode.get.toString
    assert(subtree.contains("lineitem"), s"probe not over the fact scan:\n$subtree")
    assert(!subtree.toLowerCase.contains("join"),
      s"probe sits above the join instead of the scan stage:\n$subtree")
  }
}
