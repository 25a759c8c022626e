package graft

import org.apache.spark.sql.functions._

import graft.functions.{LongArrayDot, Portable}

/** The native codegen'd dot product must agree exactly with the
  * higher-order-function formulation on real data, nulls included.
  */
class LongArrayDotSpec extends SparkSuite {
  import spark.implicits._

  test("matches aggregate(zip_with(...)) on the embeddings table") {
    val q = Portable.quantize(col("embedding"), 1000)
    val hof = aggregate(zip_with(q, q, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val diff = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(LongArrayDot.dot(q, q).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("null array yields null; mismatched lengths use the shorter") {
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L))),
      (None: Option[Seq[Long]], Some(Seq(1L))))
      .toDF("a", "b")
    val got = df.select(LongArrayDot.dot(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) == 1 * 4 + 2 * 5)
    assert(got(1).isNullAt(0))
  }

  test("GraftExtensions exposes long_array_dot to plain SQL") {
    val s2 = org.apache.spark.sql.graft.Bridge.sessionWithExtensions(
      spark.sparkContext, new GraftExtensions()(_))
    val r = s2.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect().head.getLong(0)
    assert(r == 32L)
  }

  test("participates in whole-stage codegen (generated loop present)") {
    // over plain array<bigint> attributes (the shape after a join/shuffle
    // boundary in the similarity operators); note a `transform` lambda in
    // the same projection would block codegen — HOFs are interpreted
    val df = spark.range(10).select(
      array(col("id"), col("id") + 1).as("a"),
      array(col("id") * 2, col("id") * 3).as("b"))
    val codegen = df.select(LongArrayDot.dot(col("a"), col("b")).as("d"))
      .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains(".getLong("), "generated dot loop missing")
  }
}
