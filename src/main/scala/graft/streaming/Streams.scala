package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 — the true Structured Streaming forms of the
  * batch-declared `stream_*` queries in [[graft.ops.StreamingBatch]].
  *
  * Each builder takes the (streaming or batch) events DataFrame — schema
  * `event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string` — and returns the transformed frame.
  * Structured Streaming's batch-equivalence guarantee is asserted in
  * StreamingSpec by running the same builder over a MemoryStream replay and
  * over the static frame.
  *
  * Watermarks: `withWatermark` is a no-op on batch frames, so the builders
  * are directly reusable in both modes.
  */
object Streams {

  /** Tumbling 1h windows per event_type; 10 min watermark bounds state. */
  def tumbling(events: DataFrame): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
    .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    .select(unix_timestamp(col("w.start")).as("hour_start"),
      col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1h windows every 15 min. */
  def sliding(events: DataFrame): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
    .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
    .select(unix_timestamp(col("w.start")).as("win_start"),
      col("event_type"), col("n"), col("avg_value"))

  /** Session windows with a 30-minute inactivity gap, per user. */
  def sessions(events: DataFrame): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
    .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
    .select(col("user_id"), unix_timestamp(col("w.start")).as("sess_start"),
      col("n_events"), col("sum_value"))

  /** Stateful dedup on event_id within the watermark horizon. */
  def dedup(events: DataFrame): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment against a customer-derived user dimension. */
  def staticJoin(events: DataFrame, userDim: DataFrame): DataFrame = events
    .join(broadcast(userDim), col("user_id") === col("c_custkey"))
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
      col("c_mktsegment"))
}
