package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.engine.Differ

/** Relational operator coverage (SURVEY.md §2.1/§2.2) as driver-checkable
  * queries over the parquet testdata, each paired with ANSI SQL the DuckDB
  * oracle runs on the same tables.
  *
  * Cross-engine determinism rules used throughout:
  *  - money/values are summed as integer cents (`round(x*100)::long`) so
  *    aggregation is exact and order-independent in both engines;
  *  - every query ends in a total ORDER BY over a unique key;
  *  - outputs are ints, strings, or doubles derived from exact integers
  *    (identical IEEE ops on both sides) — never raw float aggregates;
  *  - computed columns carry the same alias in Spark and SQL (the driver
  *    compares by column name).
  */
object RelationalQueries {

  private type Q = (SparkSession, String) => DataFrame

  /** `round(c*100) as long` — exact cents. Same as SQL
    * `CAST(round(c*100) AS BIGINT)`; round() is half-away-from-zero for
    * doubles in both Spark (HALF_UP) and DuckDB.
    */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  // ---------------------------------------------------------------- q01
  /** Scan + filter + projection; predicates and pruning reach parquet. */
  val q01: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 45 && col("l_discount") >= 0.05)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }
  val q01Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_discount
      |FROM lineitem WHERE l_quantity >= 45 AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Hash aggregation, TPC-H Q1 style (partial map-side agg + one shuffle
    * on the 6-ish distinct grouping keys; exact integer-cent arithmetic).
    */
  val q02: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .withColumn("qty_c", cents(col("l_quantity")))
      .withColumn("ep_c", cents(col("l_extendedprice")))
      .withColumn("disc_p", cents(col("l_discount")))
      .withColumn("tax_p", cents(col("l_tax")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("qty_c")) / 100.0).as("sum_qty"),
        (sum(col("ep_c")) / 100.0).as("sum_base_price"),
        (sum(col("ep_c") * (lit(100L) - col("disc_p"))) / 10000.0).as("sum_disc_price"),
        (sum(col("ep_c") * (lit(100L) - col("disc_p")) * (lit(100L) + col("tax_p"))) / 1000000.0).as("sum_charge"),
        round(sum(col("qty_c")) / (count(lit(1)) * 100.0), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }
  val q02Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(qty_c)/100.0 AS sum_qty,
      |  sum(ep_c)/100.0 AS sum_base_price,
      |  sum(ep_c*(100-disc_p))/10000.0 AS sum_disc_price,
      |  sum(ep_c*(100-disc_p)*(100+tax_p))/1000000.0 AS sum_charge,
      |  round(sum(qty_c)/(100.0*count(*)), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c,
      |    CAST(round(l_extendedprice*100) AS BIGINT) AS ep_c,
      |    CAST(round(l_discount*100) AS BIGINT) AS disc_p,
      |    CAST(round(l_tax*100) AS BIGINT) AS tax_p
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31'
      |)
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Multi-way join + aggregation: fact(orders) ⋈ customer ⋈ nation ⋈
    * region. Dimensions are explicitly broadcast (nation/region are tiny
    * at any scale); orders⋈customer shuffles on the key, AQE may still
    * broadcast customer at small SF.
    */
  val q03: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .withColumn("tp_c", cents(col("o_totalprice")))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(col("tp_c")) / 100.0).as("revenue"))
      .orderBy("r_name", "n_name")
  }
  val q03Sql: String =
    """SELECT r_name, n_name, count(*) AS n_orders,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Left-semi join (EXISTS). */
  val q04: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val bigLines = Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 49)
      .select(col("l_orderkey").as("o_orderkey"))
    o.join(bigLines, Seq("o_orderkey"), "left_semi")
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")
  }
  val q04Sql: String =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q05
  /** Left-anti join (NOT EXISTS) — the reference's prod-only/backup-only
    * record split (sync.py:265-268).
    */
  val q05: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }
  val q05Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q06
  /** The flagship sync-core operator: full-outer PK diff with 3-way
    * INSERT/UPDATE/DELETE classification (sync.py:255-291), driven by a
    * deterministic derived prod/backup pair of the orders table:
    *   prod   = orders minus keys ≡2 (mod 20)   → those become DELETEs
    *   backup = orders minus keys ≡0 (mod 20)   → those become INSERTs
    *            with o_totalprice+1.0 on keys ≡1 (mod 20) → UPDATEs
    */
  val q06: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val prod = o.filter(col("o_orderkey") % 20 =!= 2)
    val backup = o.filter(col("o_orderkey") % 20 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 20 === 1, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    Differ.diffOps(prod, backup, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }
  val q06Sql: String =
    """WITH prod AS (SELECT * FROM orders WHERE o_orderkey % 20 <> 2),
      |bkp AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |          CASE WHEN o_orderkey % 20 = 1 THEN o_totalprice + 1.0
      |               ELSE o_totalprice END AS o_totalprice,
      |          o_orderdate, o_orderpriority
      |        FROM orders WHERE o_orderkey % 20 <> 0)
      |SELECT COALESCE(p.o_orderkey, b.o_orderkey) AS o_orderkey,
      |  CASE WHEN b.o_orderkey IS NULL THEN 'INSERT'
      |       WHEN p.o_orderkey IS NULL THEN 'DELETE'
      |       ELSE 'UPDATE' END AS op
      |FROM prod p FULL OUTER JOIN bkp b ON p.o_orderkey = b.o_orderkey
      |WHERE p.o_orderkey IS NULL OR b.o_orderkey IS NULL
      |   OR p.o_custkey IS DISTINCT FROM b.o_custkey
      |   OR p.o_orderstatus IS DISTINCT FROM b.o_orderstatus
      |   OR p.o_totalprice IS DISTINCT FROM b.o_totalprice
      |   OR p.o_orderdate IS DISTINCT FROM b.o_orderdate
      |   OR p.o_orderpriority IS DISTINCT FROM b.o_orderpriority
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Last-wins dedup — the reference's dict-overwrite upsert
    * (sync.py:64-70) as a window: keep the last row per key by position.
    */
  val q07: Q = (s, dir) => {
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_linenumber").desc, col("l_partkey").desc, col("l_suppkey").desc)
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .orderBy("l_orderkey")
  }
  val q07Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
      |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC) AS rn
      |  FROM lineitem)
      |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Ranking + running-total windows: top-3 orders per customer with a
    * cumulative spend over order date.
    */
  val q08: Q = (s, dir) => {
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("tp_c", cents(col("o_totalprice")))
      .withColumn("rnk", row_number().over(byPrice).cast("long"))
      .withColumn("cum_spend", (sum(col("tp_c")).over(byDate) / 100.0))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "rnk", "cum_spend")
      .orderBy("o_custkey", "rnk")
  }
  val q08Sql: String =
    """SELECT o_custkey, o_orderkey, rnk, cum_spend FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
      |    sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS cum_spend
      |  FROM orders)
      |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Top-k with deterministic tiebreak (sort + limit; Spark plans a
    * TakeOrderedAndProject — no full sort materialization).
    */
  val q09: Q = (s, dir) => {
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }
  val q09Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Set operations: INTERSECT and EXCEPT on key projections
    * (the reference's PK-set splits, sync.py:245-253, 264-283).
    */
  val q10: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val oo = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    val both = f.intersect(oo).withColumn("tag", lit("both"))
    val fOnly = f.except(oo).withColumn("tag", lit("f_only"))
    both.unionByName(fOnly)
      .select("tag", "o_custkey")
      .orderBy("tag", "o_custkey")
  }
  val q10Sql: String =
    """SELECT 'both' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |UNION ALL
      |SELECT 'f_only' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |ORDER BY tag, o_custkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Diff stats aggregation — per-op counts over the q06 diff
    * (sync.py:293-300, 402-423).
    */
  val q11: Q = (s, dir) => Differ.stats(q06(s, dir)).orderBy("op")
  val q11Sql: String =
    s"""SELECT op, count(*) AS n FROM (${q06Sql.replace("ORDER BY o_orderkey", "")})
       |GROUP BY op ORDER BY op""".stripMargin

  // ---------------------------------------------------------------- q12
  /** SQL codegen as a distributed string transform: render DELETE/UPDATE
    * statements from a diff (sync.py:175-215). Perturbation here touches
    * a string column so the rendered SET clause is exact-text comparable.
    */
  val q12: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val prod = o.filter(col("o_orderkey") % 20 =!= 2)
    val backup = o.filter(col("o_orderkey") % 20 =!= 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 20 === 1, lit("X-SYNC"))
          .otherwise(col("o_orderpriority")))
    val d = Differ.diff(prod, backup, Seq("o_orderkey"))
    d.filter(col("op").isin(Differ.OP_DELETE, Differ.OP_UPDATE))
      .withColumn("stmt",
        when(col("op") === Differ.OP_DELETE,
          concat(lit("DELETE FROM `orders` WHERE `o_orderkey` = "),
            col("o_orderkey").cast("string"), lit(";")))
          .otherwise(
            concat(lit("UPDATE `orders` SET `o_orderpriority` = '"),
              regexp_replace(col(Differ.ProdPrefix + "o_orderpriority"), "'", "''"),
              lit("' WHERE `o_orderkey` = "),
              col("o_orderkey").cast("string"), lit(";"))))
      .select("o_orderkey", "op", "stmt")
      .orderBy("o_orderkey")
  }
  val q12Sql: String =
    """WITH prod AS (SELECT * FROM orders WHERE o_orderkey % 20 <> 2),
      |bkp AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
      |          CASE WHEN o_orderkey % 20 = 1 THEN 'X-SYNC'
      |               ELSE o_orderpriority END AS o_orderpriority
      |        FROM orders WHERE o_orderkey % 20 <> 0),
      |d AS (
      |  SELECT COALESCE(p.o_orderkey, b.o_orderkey) AS o_orderkey,
      |    CASE WHEN b.o_orderkey IS NULL THEN 'INSERT'
      |         WHEN p.o_orderkey IS NULL THEN 'DELETE'
      |         ELSE 'UPDATE' END AS op,
      |    p.o_orderpriority AS prod_priority
      |  FROM prod p FULL OUTER JOIN bkp b ON p.o_orderkey = b.o_orderkey
      |  WHERE p.o_orderkey IS NULL OR b.o_orderkey IS NULL
      |     OR p.o_custkey IS DISTINCT FROM b.o_custkey
      |     OR p.o_orderstatus IS DISTINCT FROM b.o_orderstatus
      |     OR p.o_totalprice IS DISTINCT FROM b.o_totalprice
      |     OR p.o_orderdate IS DISTINCT FROM b.o_orderdate
      |     OR p.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
      |SELECT o_orderkey, op,
      |  CASE WHEN op = 'DELETE'
      |    THEN 'DELETE FROM `orders` WHERE `o_orderkey` = ' || CAST(o_orderkey AS VARCHAR) || ';'
      |    ELSE 'UPDATE `orders` SET `o_orderpriority` = ''' ||
      |         replace(prod_priority, '''', '''''') ||
      |         ''' WHERE `o_orderkey` = ' || CAST(o_orderkey AS VARCHAR) || ';'
      |  END AS stmt
      |FROM d WHERE op IN ('DELETE','UPDATE')
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q13
  /** String functions: trim/upper/substring/length/concat_ws — the
    * reference's pipe-joined PK derivation (sync.py:160-173) and codegen
    * string ops.
    */
  val q13: Q = (s, dir) => {
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        concat_ws("|", col("c_custkey"), col("c_nationkey")).as("pk"),
        upper(trim(col("c_name"))).as("name_upper"),
        substring(col("c_mktsegment"), 1, 3).as("seg3"),
        length(col("c_name")).cast("long").as("name_len"))
      .orderBy("c_custkey")
  }
  val q13Sql: String =
    """SELECT c_custkey,
      |  concat_ws('|', CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR)) AS pk,
      |  upper(trim(c_name)) AS name_upper,
      |  substring(c_mktsegment, 1, 3) AS seg3,
      |  CAST(length(c_name) AS BIGINT) AS name_len
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Date functions: truncation/formatting/extraction + monthly rollup. */
  val q14: Q = (s, dir) => {
    Tables.orders(s, dir)
      .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .withColumn("tp_c", cents(col("o_totalprice")))
      .groupBy("ym", "yr")
      .agg(count(lit(1)).as("n_orders"), (sum(col("tp_c")) / 100.0).as("revenue"))
      .orderBy("ym")
  }
  val q14Sql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS ym,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  count(*) AS n_orders,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS revenue
      |FROM orders GROUP BY 1, 2 ORDER BY ym""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Event-time tumbling-window aggregation (batch form of the streaming
    * pipeline; value summed in exact 1e-4 units).
    */
  val q15: Q = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("bucket", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00"))
      .withColumn("v4", round(col("value") * 10000).cast("long"))
      .groupBy("bucket", "event_type")
      .agg(count(lit(1)).as("n"), (sum(col("v4")) / 10000.0).as("sum_value"))
      .orderBy("bucket", "event_type")
  }
  val q15Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
      |  event_type, count(*) AS n,
      |  sum(CAST(round(value*10000) AS BIGINT))/10000.0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_scan_filter" -> q01,
    "q02_agg_pricing" -> q02,
    "q03_join_agg" -> q03,
    "q04_semi_join" -> q04,
    "q05_anti_join" -> q05,
    "q06_table_diff" -> q06,
    "q07_last_wins_dedup" -> q07,
    "q08_window_rank" -> q08,
    "q09_topk" -> q09,
    "q10_setops" -> q10,
    "q11_diff_stats" -> q11,
    "q12_codegen_sql" -> q12,
    "q13_string_funcs" -> q13,
    "q14_date_funcs" -> q14,
    "q15_events_window" -> q15)

  val oracle: Map[String, String] = Map(
    "q01_scan_filter" -> q01Sql,
    "q02_agg_pricing" -> q02Sql,
    "q03_join_agg" -> q03Sql,
    "q04_semi_join" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_table_diff" -> q06Sql,
    "q07_last_wins_dedup" -> q07Sql,
    "q08_window_rank" -> q08Sql,
    "q09_topk" -> q09Sql,
    "q10_setops" -> q10Sql,
    "q11_diff_stats" -> q11Sql,
    "q12_codegen_sql" -> q12Sql,
    "q13_string_funcs" -> q13Sql,
    "q14_date_funcs" -> q14Sql,
    "q15_events_window" -> q15Sql)
}
