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

  /** Normalize a timestamp-bearing column to microsecond TimestampType
    * regardless of how the driver's parquet writer encoded it across
    * testdata generations: TIMESTAMP(NANOS) read as long via
    * `nanosAsLong` (truncating `div 1000` — the same truncation DuckDB
    * applies), TIMESTAMP_NTZ (`isAdjustedToUTC=false`, what pyarrow
    * `timestamp[us]` without a zone reads as in Spark 4), or already
    * TimestampType. The session timezone is UTC everywhere, so the
    * NTZ→LTZ cast is wall-clock-preserving — identical to DuckDB's
    * naive read of the same file.
    */
  def normalizeTs(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(name).dataType match {
      case LongType =>
        df.withColumn(name, timestamp_micros(expr(s"$name div 1000")))
      case TimestampNTZType =>
        df.withColumn(name, col(name).cast(TimestampType))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  // orders/lineitem timestamp columns stay as the file reads them
  // (TIMESTAMP_NTZ on current testdata): NTZ is exactly DuckDB's naive
  // read AND the typed-mode DATETIME mapping (TypedModeSpec round-trip);
  // no query needs epoch arithmetic on them.
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"), "ts")
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

  /** Store dir for a fingerprint-gated persisted artifact of `family`
    * derived from dataset `dataDir`: keyed by the dataset's basename
    * (human-readable) PLUS a hash of its absolute path — two datasets
    * that share a basename (two checkouts of "sf0.1") must never thrash
    * one store dir between them, each rebuild evicting the other's.
    * Freshness within one dir stays the ContentGate fingerprint's job.
    */
  def storeDir(family: String, dataDir: String): String = {
    val abs = new java.io.File(dataDir).getAbsolutePath
    val h = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(abs))
    s"/tmp/graft_${family}_${new java.io.File(abs).getName}_$h"
  }
}
