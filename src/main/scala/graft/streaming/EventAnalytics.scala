package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the events schema (event_id, ts, user_id,
  * event_type, value, props). Every function takes a DataFrame that may
  * be batch OR streaming — the same plan runs both ways (Structured
  * Streaming's core contract), so the DuckDB-checked batch query
  * q15_events_window is literally the batch execution of
  * [[windowedAgg]]'s logic.
  *
  * Scale: windowed aggregations shuffle on (window, key); watermarks
  * bound state size (late data beyond the watermark is dropped), which
  * is what keeps per-executor state finite on an unbounded stream.
  */
object EventAnalytics {

  /** Exact integer sum units for `value` (see RelationalQueries rules). */
  private def v4(c: Column): Column = round(c * 10000).cast("long")

  /** Tumbling event-time window aggregation with a watermark. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(v4(col("value"))) / 10000.0).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user session windows (gap-based). */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(v4(col("value"))) / 10000.0).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup on event_id, state bounded by the watermark. */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
