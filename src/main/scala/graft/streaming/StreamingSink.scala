package graft.streaming

import graft.sources.{ParquetStore, SaveStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream → table-store sink via `foreachBatch`, running the reference's
  * chunked-ingest save-strategy state machine (xl_db.rs:217-239: first chunk
  * creates under the declared strategy, later chunks append/upsert) against
  * a continuous source instead of Excel chunks.
  *
  * Delivery: foreachBatch is at-least-once — on recovery the last batch may
  * re-run. `Upsert` is idempotent under replay (same ids overwrite);
  * `Replace→Append` can duplicate the replayed batch, the same contract as
  * the reference's chunked Append (and the JDBC appendInto note). Use
  * Upsert when the stream carries a key.
  */
object StreamingSink {

  /** Start writing `stream` into `store.table` under `strategy`.
    * Replace/FailIfExists apply to the FIRST batch only (table creation);
    * every later batch appends — or re-upserts when `strategy` is Upsert.
    */
  def toStore(stream: DataFrame, store: ParquetStore, table: String,
              strategy: SaveStrategy): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val effective = strategy match {
          case SaveStrategy.Replace | SaveStrategy.FailIfExists if batchId > 0 =>
            SaveStrategy.Append
          case other => other
        }
        store.write(batch, table, effective)
      }
      .start()
}
