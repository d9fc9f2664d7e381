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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (err.isDefined) -1.0 else sec, err)
    }
    val qs = results.map { case (k, v, _) => s"\"${esc(k)}\":$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"\"${esc(k)}\":\"${esc(m)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
