package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch-checkable forms of the remaining streaming-window shapes:
  * gap-based sessionization (Spark `session_window`, oracled by the SQL
  * islands formulation) and sliding event-time windows (Spark `window`
  * with slide, oracled by epoch-bucket arithmetic). Both run unchanged
  * as Structured Streaming plans (streaming/EventAnalytics).
  */
object EventQueries {

  private type Q = (SparkSession, String) => DataFrame

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  // ---------------------------------------------------------------- q41
  /** Per-user sessions with a 10-minute gap: native session_window;
    * session end = last event + gap.
    */
  val q41: Q = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("v4", round(col("value") * 10000).cast("long"))
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), (sum(col("v4")) / 10000.0).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), TsFmt).as("session_start"),
        date_format(col("session_window.end"), TsFmt).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
  }
  val q41Sql: String =
    """WITH e AS (SELECT user_id, ts,
      |    CAST(round(value*10000) AS BIGINT) AS v4 FROM events),
      |f AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
      |    THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid FROM f)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  strftime(max(ts) + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      |  count(*) AS n_events, sum(v4)/10000.0 AS sum_value
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- q42
  /** Sliding windows: 1-hour length, 30-minute slide (each event lands in
    * two windows).
    */
  val q42: Q = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("v4", round(col("value") * 10000).cast("long"))
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(col("v4")) / 10000.0).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }
  val q42Sql: String =
    """WITH e AS (SELECT event_type, CAST(round(value*10000) AS BIGINT) AS v4,
      |    epoch_us(ts)//1800000000 AS b30 FROM events),
      |w AS (SELECT event_type, v4, (b30 - k)*1800 AS wstart_s
      |  FROM e CROSS JOIN (SELECT unnest([0,1]) AS k))
      |SELECT strftime(TIMESTAMP '1970-01-01' + wstart_s * INTERVAL '1 second',
      |    '%Y-%m-%d %H:%M') AS window_start,
      |  event_type, count(*) AS n, sum(v4)/10000.0 AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q43
  /** User-defined typed aggregation: top-3 orders per status via the
    * TopKAggregator (bounded-buffer partial aggregation).
    */
  val q43: Q = (s, dir) => {
    val tk = graft.functions.TopKAggregator.topK(3)
    Tables.orders(s, dir)
      .withColumn("tp_c", round(col("o_totalprice") * 100).cast("long"))
      .groupBy("o_orderstatus")
      .agg(tk(col("o_orderkey"), col("tp_c")).as("top"))
      .select(col("o_orderstatus"), explode(col("top")).as("t"))
      .select(col("o_orderstatus"), col("t.id").as("o_orderkey"),
        (col("t.score") / 100.0).as("o_totalprice"))
      .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))
  }
  val q43Sql: String =
    """SELECT o_orderstatus, o_orderkey, tp/100.0 AS o_totalprice FROM (
      |  SELECT o_orderstatus, o_orderkey,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS tp,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |      ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Interval join (click attribution): each click joined to the same
    * user's views in the preceding hour — the batch execution of the
    * stream-stream join `EventAnalytics.clickAttribution` (StreamingSpec
    * proves stream==batch on the same plan). Timestamps compare at
    * microsecond granularity on both engines (the parquet carries
    * sub-microsecond noise that Spark's µs timestamps truncate).
    */
  val q50: Q = (s, dir) =>
    graft.streaming.EventAnalytics.clickAttribution(Tables.events(s, dir))
      .orderBy("click_id", "view_id")
  val q50Sql: String =
    """SELECT c.event_id AS click_id, v.event_id AS view_id,
      |  c.user_id, epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
      |FROM events c JOIN events v
      |  ON c.event_type = 'click' AND v.event_type = 'view'
      | AND v.user_id = c.user_id
      | AND epoch_us(v.ts) <= epoch_us(c.ts)
      | AND epoch_us(v.ts) >= epoch_us(c.ts) - 3600000000
      |ORDER BY click_id, view_id""".stripMargin

  // ---------------------------------------------------------------- q59
  /** As-of join: each purchase matched to the same user's most recent
    * click at-or-before it ([[graft.operators.AsOf.joinAsOf]] — single
    * shuffle, no range fan-out). The oracle is DuckDB's NATIVE ASOF LEFT
    * JOIN — an independent algorithm for the same semantics, so agreement
    * checks the operator, not a shared formulation. Timestamps compare as
    * epoch microseconds (both engines truncate the parquet's
    * sub-microsecond noise identically); no (user, µs) ties exist in the
    * testdata at any SF, so the match is unique on both sides.
    */
  val q59: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us")
    graft.operators.AsOf.joinAsOf(purchases, clicks,
        Seq("user_id"), "ts_us")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("purchase_ts_us"),
        col("asof.event_id").as("click_id"),
        (col("ts_us") - col("asof.ts_us")).as("gap_us"))
      .orderBy("purchase_id")
  }
  val q59Sql: String =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  epoch_us(p.ts) AS purchase_ts_us,
      |  c.event_id AS click_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY purchase_id""".stripMargin

  // --------------------------------------------------------------- q117
  /** Keyless range join ([[graft.operators.RangeJoin.pointInInterval]]):
    * every high-value purchase opens a global 10-minute incident window;
    * count the error events inside each. Unlike q50 there is NO equi key
    * — any user's error lands in any incident — so the naive plan is a
    * cartesian/BNL product; the operator's bucket expansion turns it into
    * one hash shuffle (PlanAssertSpec pins no-cartesian/no-BNL). Windows
    * with zero errors are kept (left join back to the interval set).
    */
  val q117: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val points = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"),
        unix_micros(col("ts")).as("pt"),
        (round(col("value") * 100)).cast("long").as("err_c"))
    val intervals = ev
      .filter(col("event_type") === "purchase" && col("value") > 150.0)
      .select(col("event_id").as("incident_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 600000000L).as("e"))
    val pairs = graft.operators.RangeJoin.pointInInterval(
      points, "pt", intervals, "s", "e", bucketWidth = 600000000L)
    val hits = pairs.groupBy("incident_id")
      .agg(count(lit(1)).as("n_errors"), sum(col("err_c")).as("err_value_c"))
    intervals.select("incident_id")
      .join(hits, Seq("incident_id"), "left")
      .select(col("incident_id"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"),
        coalesce(col("err_value_c"), lit(0L)).as("err_value_c"))
      .orderBy("incident_id")
  }
  val q117Sql: String =
    """WITH iv AS (SELECT event_id AS incident_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + 600000000 AS e
      |  FROM events WHERE event_type = 'purchase' AND value > 150.0),
      |pt AS (SELECT event_id AS err_id, epoch_us(ts) AS pt,
      |    CAST(round(value*100) AS BIGINT) AS err_c
      |  FROM events WHERE event_type = 'error'),
      |hits AS (SELECT iv.incident_id, count(*) AS n_errors,
      |    sum(pt.err_c) AS err_value_c
      |  FROM pt JOIN iv ON pt.pt BETWEEN iv.s AND iv.e
      |  GROUP BY iv.incident_id)
      |SELECT iv.incident_id, coalesce(hits.n_errors, 0) AS n_errors,
      |  CAST(coalesce(hits.err_value_c, 0) AS BIGINT) AS err_value_c
      |FROM iv LEFT JOIN hits ON hits.incident_id = iv.incident_id
      |ORDER BY iv.incident_id""".stripMargin

  // --------------------------------------------------------------- q122
  /** Keyless interval-overlap join ([[graft.operators.RangeJoin
    * .intervalOverlap]]): pairs of q117's incident windows that overlap
    * in time — concurrent-incident detection, the interval×interval
    * sibling of q117's point-in-interval. Exactly-once via the
    * first-shared-bucket rule; exact overlap length in µs.
    */
  val q122: Q = (s, dir) => {
    val iv = Tables.events(s, dir)
      .filter(col("event_type") === "purchase" && col("value") > 100.0)
      .select(col("event_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 3600000000L).as("e"))
    val a = iv.select(col("event_id").as("id_a"), col("s").as("sa"),
      col("e").as("ea"))
    val b = iv.select(col("event_id").as("id_b"), col("s").as("sb"),
      col("e").as("eb"))
    graft.operators.RangeJoin.intervalOverlap(
        a, "sa", "ea", b, "sb", "eb", bucketWidth = 3600000000L)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")))
          .as("overlap_us"))
      .orderBy("id_a", "id_b")
  }
  val q122Sql: String =
    """WITH iv AS (SELECT event_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + 3600000000 AS e
      |  FROM events WHERE event_type = 'purchase' AND value > 100.0)
      |SELECT a.event_id AS id_a, b.event_id AS id_b,
      |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
      |FROM iv a JOIN iv b
      |  ON a.event_id < b.event_id AND a.s <= b.e AND b.s <= a.e
      |ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "q122_interval_overlap" -> q122,
    "q41_sessionize" -> q41,
    "q42_sliding_window" -> q42,
    "q43_topk_udaf" -> q43,
    "q50_interval_join" -> q50,
    "q59_asof_join" -> q59,
    "q117_range_join_keyless" -> q117)

  val oracle: Map[String, String] = Map(
    "q122_interval_overlap" -> q122Sql,
    "q41_sessionize" -> q41Sql,
    "q42_sliding_window" -> q42Sql,
    "q43_topk_udaf" -> q43Sql,
    "q50_interval_join" -> q50Sql,
    "q59_asof_join" -> q59Sql,
    "q117_range_join_keyless" -> q117Sql)
}
