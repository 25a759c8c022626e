package graft

import org.apache.spark.sql.functions._

import graft.operators.Colocate

/** Bucketed co-located joins: one write-time shuffle buys exchange-free
  * equi-joins afterwards — the plan must contain no shuffle on the join
  * key and return the same rows as the plain join.
  */
class ColocateSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("join of bucketized tables plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, dir).select(
      col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

    Colocate.bucketize(li, "b_lineitem", "l_orderkey", 8)
    Colocate.bucketize(ord, "b_orders", "l_orderkey", 8)

    val joined = Colocate.colocatedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free bucketed join, plan:\n$plan")
    // same result as the plain (shuffling) join
    assert(joined.count() == li.join(ord, "l_orderkey").count())
  }
}
