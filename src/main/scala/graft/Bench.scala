package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":N,"unit":"sec","queries":{..}}.
  *
  * The action is a noop-sink write (`format("noop")`), not `.count()`: count
  * lets Catalyst prune every projection (a SELECT-shaped query would benchmark
  * only the scan), while the noop sink evaluates every output column and
  * discards rows at the sink — the honest cost of the full plan. Query
  * failures are NOT swallowed into a fast-looking time: the query gets
  * value -1 and its message lands in an "errors" object.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    // min of 2 back-to-back runs per query: this host shows sporadic
    // multi-second CPU-steal stalls (a 0.2s query can read 13s on a bad
    // draw); the min is the steady-state cost of the plan, which is the
    // thing a benchmark should report. Errors surface on the first run.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var best = Double.MaxValue
      var err: Option[String] = None
      var i = 0
      while (i < iters && err.isEmpty) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable => err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      (name, if (err.isDefined) -1.0 else best, err)
    }
    val qs = results.map { case (k, v, _) => s"\"${esc(k)}\":$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"\"${esc(k)}\":\"${esc(m)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
