package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Second batch of relational coverage: pivot, math/array functions over
  * embeddings, and rollup (grouping sets). Same oracle-parity rules as
  * RelationalQueries.
  */
object RelationalQueries2 {

  private type Q = (SparkSession, String) => DataFrame

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  // ---------------------------------------------------------------- q17
  /** Pivot: order counts per priority × status (the reference's per-table
    * stats matrix shape, sync.py:293-300, as groupBy.pivot).
    */
  val q17: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")
  }
  val q17Sql: String =
    """SELECT o_orderpriority,
      |  sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS "F",
      |  sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS "O",
      |  sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Math/array functions over the embedding vectors: exact quantized
    * norm, element min/max, rounded mean.
    */
  val q18: Q = (s, dir) => {
    val q = graft.functions.Portable.quantize(col("embedding"), 1000)
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(sqrt(graft.functions.Portable.dotQ(q, q).cast("double")) / 1000.0, 6)
          .as("l2_norm"),
        array_max(q).as("max_q"),
        array_min(q).as("min_q"),
        round(aggregate(q, lit(0L), (acc, x) => acc + x).cast("double")
          / (size(col("embedding")) * 1000.0), 6).as("mean_v"))
      .orderBy("vec_id")
  }
  val q18Sql: String =
    """SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS dim,
      |  round(sqrt(CAST(list_dot_product(q, q) AS DOUBLE)) / 1000.0, 6) AS l2_norm,
      |  list_max(q) AS max_q,
      |  list_min(q) AS min_q,
      |  round(CAST(list_reduce(q, (a,b) -> a+b) AS DOUBLE) / (len(embedding) * 1000.0), 6) AS mean_v
      |FROM (SELECT vec_id, embedding, list_transform(embedding,
      |        x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
      |      FROM embeddings)
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Rollup: revenue at (region, nation), per-region subtotal, and grand
    * total; NULL grouping slots labeled for stable comparison.
    */
  val q19: Q = (s, dir) => {
    // via spark.sql: the Dataset rollup API trips the ambiguous-self-join
    // check when the grouping columns are referenced after agg; the SQL
    // analyzer resolves GROUP BY ROLLUP cleanly (and shows the SQL entry
    // point + broadcast hints)
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.nation(s, dir).createOrReplaceTempView("v_nation")
    Tables.region(s, dir).createOrReplaceTempView("v_region")
    s.sql(
      """SELECT /*+ BROADCAST(v_nation), BROADCAST(v_region) */
        |  coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        |  count(*) AS n_orders,
        |  sum(CAST(round(o_totalprice*100) AS BIGINT))/CAST(100 AS DOUBLE) AS revenue
        |FROM v_orders
        |JOIN v_customer ON o_custkey = c_custkey
        |JOIN v_nation ON c_nationkey = n_nationkey
        |JOIN v_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name, n_name""".stripMargin)
  }
  val q19Sql: String =
    """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
      |  count(*) AS n_orders,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name, n_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "q17_pivot" -> q17,
    "q18_math_array" -> q18,
    "q19_rollup" -> q19)

  val oracle: Map[String, String] = Map(
    "q17_pivot" -> q17Sql,
    "q18_math_array" -> q18Sql,
    "q19_rollup" -> q19Sql)
}
