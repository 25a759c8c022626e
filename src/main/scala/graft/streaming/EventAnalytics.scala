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

  /** Windowed distinct-user cardinality via the portable integer HLL —
    * the unbounded-domain counterpart of [[windowedAgg]]'s counts:
    * exact `countDistinct` state grows with the number of distinct
    * users per window, while the sketch state is a FIXED 2^p registers
    * per window regardless of traffic. Structured Streaming permits
    * one stateful aggregation per query, so this uses the single-UDAF
    * register formulation ([[graft.operators.Sketches.hllPrep]] /
    * `hllRegsAgg` / `hllEstFromRegs`): bucket+rank projected per event,
    * ONE typed aggregate building the 2^p-register array, estimate
    * folded map-side after it. Identical integers batch or streamed
    * (and bit-identical to the row-formulation sketch — spec-pinned).
    * The plan is constant-size, which matters because streaming
    * re-optimizes per micro-batch: the earlier 2^p-aggregate-COLUMN
    * form (`hllRegCols`) measured 20.9 s warm for a 4-batch drive with
    * 3 state rows — all planner time.
    */
  def windowedDistinct(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours", p: Int = 7): DataFrame = {
    import graft.operators.Sketches
    events
      .withWatermark("ts", watermark)
      .select(col("ts") +: Sketches.hllPrep(col("user_id"), p): _*)
      .groupBy(window(col("ts"), windowLen))
      .agg(Sketches.hllRegsAgg(p).as("__regs"))
      .select(col("window.start").as("window_start"),
        Sketches.hllEstFromRegs("__regs", p).as("est_users"))
  }

  /** Windowed value-distribution sketch — the quantile counterpart of
    * [[windowedDistinct]]'s cardinality: per hour window, the
    * DDSketch-style integer log histogram
    * ([[graft.operators.Sketches.logHistSketch]]) of cent-scaled event
    * values. State per window is bounded by the ~600-bucket value
    * domain regardless of traffic (a per-window `percentile_approx`
    * buffers values), the (window, bucket) counts stream in the single
    * stateful aggregation, and quantiles read off the sketch later with
    * [[graft.operators.Sketches.logHistQuantiles]] — the p50/p95/p99
    * latency-monitoring shape on an unbounded stream. Identical
    * integers batch or streamed.
    */
  def windowedValueSketch(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    import graft.operators.Sketches
    // Group by the window() struct itself, like [[windowedAgg]]: pulling
    // window.start out BEFORE the stateful groupBy (GetStructField +
    // Alias) drops the event-time watermark metadata, so the store would
    // never evict closed windows and append mode would never finalize.
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), round(col("value") * 100).cast("long").as("v"))
      .filter(col("v") > 0)
      .groupBy(window(col("ts"), windowLen),
        Sketches.logBucket(col("v")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("bucket"),
        col("cnt"))
  }

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

  /** Streaming Benford feed monitor — the online half of q202's
    * fabricated-data audit: running leading-digit counts of the cent
    * value per event type, a complete-mode aggregate whose state is
    * DOMAIN-bounded (|types| × 9 rows) rather than watermark-bounded,
    * so it runs forever at constant state. Read the sink through
    * [[graft.operators.Stats.benfordFromCounts]] to get the identical
    * deviation report the batch audit produces — the stream and the
    * batch share the digit extraction by construction
    * ([[graft.operators.Stats.leadingDigitCounts]]).
    */
  def digitCounts(events: DataFrame): DataFrame =
    graft.operators.Stats.leadingDigitCounts(events, col("event_type"),
      round(col("value") * 100).cast("long"))

  /** Streaming hour-of-day seasonality monitor — the online half of
    * q224's diurnal baseline: running (type × hour) counts in one
    * complete-mode aggregate whose state is DOMAIN-bounded
    * (|types| × 24 rows), so it runs forever at constant state. Read
    * the sink through [[graft.operators.EventOps.seasonalityFromCounts]]
    * to get the identical grid the batch profile produces — stream and
    * batch share the hour extraction by construction
    * ([[graft.operators.EventOps.hourOfDayCounts]]).
    */
  def hourCounts(events: DataFrame): DataFrame =
    graft.operators.EventOps.hourOfDayCounts(events,
      col("event_type"), col("ts"))

  /** Stream-stream interval join (click attribution): each `click` event
    * joined to the same user's `view` events in the preceding hour. The
    * equi-key (user) plus the event-time range condition is what lets
    * Structured Streaming expire join state as the watermarks advance —
    * the canonical bounded-state stream-stream join. The same plan runs
    * batch (q50's DuckDB-checked execution). Output gap is exact integer
    * microseconds, so results are engine- and partitioning-independent.
    */
  def clickAttribution(events: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
        col("user_id") === col("view_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("view_id"), col("user_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"))
  }
}
