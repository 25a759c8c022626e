package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory (e.g. /root/testdata/sf0.01)
  * and read only the tables they need — column pruning and predicate
  * pushdown then reach the parquet scan for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which vanilla Spark
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and convert to
    * a microsecond TimestampType with exact integer division (`div`,
    * truncating — the same truncation DuckDB applies to ns parquet).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  /** documents/embeddings ship as one single-row-group file per SF, so the
    * scan is ONE partition regardless of maxPartitionBytes. The loaders
    * deliberately do NOT repartition: [[graft.operators.Spread.ensure]]
    * belongs INSIDE each operator, after any union/re-keying and on the
    * key its downstream aggregation groups by, so the one exchange it adds
    * is the exchange the agg would need anyway. A loader-level spread was
    * measured to HURT union-building consumers (q54: the union destroys
    * the partitioning, so the heavy text flowed through the spread
    * exchange AND a second agg exchange — 1.6s→4.0s warm).
    */
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
