package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event operators — the same
  * declarative plan runs over a stream (`readStream` → transform →
  * `writeStream`) or a table, which is the engine's answer to the
  * reference's real-time insert path (reference:
  * src/router/handle/insert_index_handle.rs — incremental updates):
  * micro-batch ingestion with event-time semantics instead of per-row
  * index mutation.
  *
  * Scale notes: the windowed aggregation is a streaming state store keyed
  * by (window, event_type) — partial aggregation per micro-batch, state
  * size O(open windows × types), bounded by the watermark which evicts
  * closed windows. Dedup keeps one state entry per event_id inside the
  * watermark horizon only.
  */
object EventStream {

  /** Tumbling 1-hour window per event_type: the streaming twin of
    * Queries.eventsWindowed (same output schema). Works on a streaming or
    * batch DataFrame with columns (ts TIMESTAMP, event_type, value).
    */
  def windowedAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Watermarked exactly-once dedup by event_id (late duplicates beyond
    * the watermark are dropped by definition).
    */
  def dedupByEventId(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")
}
