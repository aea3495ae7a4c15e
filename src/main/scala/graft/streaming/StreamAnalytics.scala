package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over graft-table (or any) streams — the Structured
  * Streaming surface of the engine beyond ingest/delivery: watermarked
  * event-time window aggregation and keyed custom state. Both are
  * north-rule additions (the reference is batch-only, SURVEY.md §2.5).
  *
  * Scale shape: windowed aggregation is Spark's incremental stateful agg
  * (partial aggregation per micro-batch, state keyed by (window, keys) in
  * the state store, watermark-driven eviction). The custom-state dedup
  * keeps one boolean per key in the state store, sharded by the shuffle
  * partitioning — at 10^12 keys use the TTL so state stays bounded by the
  * dedup horizon, which is the standard streaming-dedup memory trade.
  */
object StreamAnalytics {

  /** Tumbling event-time window counts with a watermark: late data beyond
    * `watermarkDelay` is dropped and closed windows are emitted exactly
    * once in append mode (the mode the test drives). */
  def windowedCounts(stream: DataFrame, tsCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n"))

  /** Streaming exact dedup with EXPLICIT keyed state
    * (flatMapGroupsWithState): the first row per key — across
    * micro-batches, smallest id within a batch — is emitted, every later
    * occurrence is dropped. Unlike `dropDuplicates` on a stream, the
    * state is under our control: pass `stateTtlMs` to expire keys after a
    * processing-time horizon (bounded memory; duplicates separated by
    * more than the horizon re-admit — the standard trade, stated rather
    * than implied). Output schema: (key, id). */
  def dedupFirstSeen(stream: DataFrame, keyCol: String, idCol: String,
                     stateTtlMs: Option[Long] = None): Dataset[(String, String)] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    stream.select(col(keyCol).cast("string"), col(idCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, String)](OutputMode.Append, timeout) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // seen in an earlier batch
          else {
            state.update(true)
            stateTtlMs.foreach(state.setTimeoutDuration)
            Iterator.single(key -> rows.map(_._2).min) // deterministic pick
          }
      }
  }
}
