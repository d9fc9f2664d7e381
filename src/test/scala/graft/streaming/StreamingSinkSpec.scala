package graft.streaming

import graft.SparkSpec
import graft.sources.{ParquetStore, SaveStrategy}
import org.apache.spark.sql.functions._

/** foreachBatch save-strategy state machine over a multi-batch file stream:
  * Replace creates on batch 0 then appends; Upsert stays idempotent when
  * the same keys arrive again.
  */
class StreamingSinkSpec extends SparkSpec {

  private def stage(dir: String, copies: Int): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    (1 to copies).foreach { i =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/events.parquet"),
        java.nio.file.Paths.get(s"$dir/events_$i.parquet"))
    }
  }

  private def stream(dir: String) =
    StreamingWindows.readEventsStream(spark, dir, Map("maxFilesPerTrigger" -> "1"))
      .select(col("event_id"), col("event_type"), col("value"))

  test("Replace: batch 0 creates, later batches append") {
    val dir = "/tmp/graft_sink_replace"
    stage(dir, copies = 2)
    val store = new ParquetStore("/tmp/graft_sink_store_r")
    store.drop("ev")
    val q = StreamingSink.toStore(stream(dir), store, "ev", SaveStrategy.Replace)
    try q.processAllAvailable() finally q.stop()
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(store.read(spark, "ev").count() == 2 * n) // both copies landed
  }

  test("Upsert: replayed keys stay idempotent") {
    val dir = "/tmp/graft_sink_upsert"
    stage(dir, copies = 2)
    val store = new ParquetStore("/tmp/graft_sink_store_u")
    store.drop("ev")
    val q = StreamingSink.toStore(stream(dir), store, "ev", SaveStrategy.Upsert("event_id"))
    try q.processAllAvailable() finally q.stop()
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(store.read(spark, "ev").count() == n) // second copy upserted same ids
  }
}
