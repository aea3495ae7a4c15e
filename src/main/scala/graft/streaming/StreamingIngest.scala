package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.table.TsTable

/** Structured Streaming ingestion into a graft table.
  *
  * The reference is batch-only (SURVEY.md §2.5); this is the Spark-native
  * extension: a `foreachBatch` sink that turns each micro-batch into one
  * transactional append — stats, coverage, overlap check and OCC commit
  * included — so a stream lands as ordinary immutable segments that
  * compaction later bin-packs and clusters. Exactly-once at the table
  * level comes from idempotent retry: `foreachBatch` may re-run a batch
  * after recovery, and the batch-id guard skips batches already committed
  * (the batch id is recorded in the lineage journal, driver-side).
  */
object StreamingIngest {

  /** Attach a graft-table sink to a streaming DataFrame. Caller starts the
    * query (so tests can use Trigger.AvailableNow with MemoryStream). */
  def sink(stream: DataFrame, table: TsTable,
           checkpointDir: String): DataStreamWriter[Row] = {
    val journal = new graft.maintain.LineageJournal(table.root, "streaming-ingest")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val binId = f"batch-$batchId%012d"
        if (!journal.completedBins().contains(binId)) {
          if (!batch.isEmpty) {
            val t0 = System.currentTimeMillis()
            val v = table.append(batch)
            journal.record(graft.maintain.BinRecord(binId, Nil, Some(v),
              Some(graft.maintain.BinMetrics(batch.count(), 0L, 0, 0L, 0L, 0,
                System.currentTimeMillis() - t0))))
          } else {
            journal.record(graft.maintain.BinRecord(binId, Nil, None, None))
          }
        }
      }
  }

  /** Convenience: run a bounded ingestion (all currently-available data)
    * and wait for it to finish. */
  def ingestAvailable(stream: DataFrame, table: TsTable, checkpointDir: String): StreamingQuery = {
    val q = sink(stream, table, checkpointDir).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
