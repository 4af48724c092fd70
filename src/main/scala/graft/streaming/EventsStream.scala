package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twin of the batch event queries
  * (SURVEY.md §2 events block).
  *
  * The same transformation works on a batch DataFrame and a streaming
  * one — Spark's unified Dataset API — so correctness is asserted by
  * running `tumblingAgg` over a MemoryStream in the spec and comparing
  * with the batch result of the same input. With a real source this is
  * `spark.readStream.format("kafka")...` + `writeStream` with a
  * checkpoint; the watermark bounds state for late data.
  */
object EventsStream {

  /** Tumbling 1-hour aggregate with a 2-hour watermark. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Running per-user event counts — stateful aggregation in streaming
    * (complete/update mode), plain groupBy in batch. */
  def userCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))

  /** Streaming exact-dedup: drop events whose id was already seen,
    * with state bounded by the watermark (ids older than the horizon
    * are evicted — the streaming twin of Dedup.exactDedup's keep-first
    * semantics, scoped to the watermark window).
    *
    * Keyed on event_id ALONE: the same id at a different timestamp is
    * still a duplicate. `dropDuplicatesWithinWatermark` lets state
    * expire by event time without `ts` being part of the key —
    * plain `dropDuplicates("event_id")` would keep every id forever. */
  def dedupStream(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")
}
