package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Root-cause probe for the r11 "concurrent staging writes are SLOWER"
  * anomaly (VERDICT r11 item 6): times N single-task filtered parquet
  * writes of one frame run (a) sequentially and (b) from a 2-thread pool
  * (guide §2.6 overlap), a few reps each, and prints per-write and total
  * walls. Run: `runMain graft.tools.OverlapProbe <sfDir> <reps>`.
  */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .appName("overlap-probe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source").localCheckpoint(true)
    val cuts = Seq(col("doc_id") % 2 === 0, col("doc_id") % 2 === 1)
    val base = java.nio.file.Files.createTempDirectory("overlap_probe_").toString

    def oneWrite(tag: String, i: Int, cut: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      docs.where(cut).coalesce(1).write.mode("overwrite")
        .parquet(s"$base/${tag}_$i")
      (System.nanoTime() - t0) / 1000000
    }

    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val seqMs = cuts.zipWithIndex.map { case (c, i) => oneWrite(s"seq$r", i, c) }
      val seqWall = (System.nanoTime() - t0) / 1000000
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val t1 = System.nanoTime()
      val futs = cuts.zipWithIndex.map { case (c, i) =>
        scala.concurrent.Future(oneWrite(s"conc$r", i, c))
      }
      val concMs = futs.map(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      val concWall = (System.nanoTime() - t1) / 1000000
      pool.shutdown()
      println(s"[probe] rep$r sequential: per-write=${seqMs.mkString(",")}ms wall=${seqWall}ms" +
        s" | concurrent: per-write=${concMs.mkString(",")}ms wall=${concWall}ms")
    }
    spark.stop()
  }
}
