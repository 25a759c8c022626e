package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketing: write both sides bucketed (and
  * sorted) on the join key, and every subsequent equi-join on that key
  * is planned WITHOUT a shuffle exchange — the bucket files are the
  * partitioning. This is the standard repeated-join amortization at
  * 100 TB: pay one write-time shuffle, then every downstream join of the
  * fact/dim pair is exchange-free.
  */
object Colocate {

  /** Persist `df` as a bucketed+sorted table in the session catalog.
    * Drops any previous table AND its on-disk location first — a
    * location orphaned by an earlier session (catalog entry gone, files
    * present) would otherwise fail the CTAS with LOCATION_ALREADY_EXISTS.
    * The location is resolved through the session catalog
    * ([[org.apache.spark.sql.graft.Bridge.tableLocation]]: the existing
    * table's metadata location, else `defaultTablePath`), never derived
    * by convention — a convention path misses non-default databases and
    * could delete an unrelated same-named directory under the warehouse
    * root.
    */
  def bucketize(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    bucketizeKeys(df, table, Seq(key), buckets)

  /** [[bucketize]] on a composite key (e.g. the sync engine's
    * (table, pk)): joins on exactly this column set plan exchange-free.
    */
  def bucketizeKeys(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    bucketizeKeysPartitioned(df, table, Nil, keys, buckets)

  /** [[bucketizeKeys]] with directory partitioning on top: rows are laid
    * out under one directory per `partitionCols` value, and bucketed on
    * `keys` WITHIN each directory. Joins on `keys` still plan
    * exchange-free (the scan zips all files of a bucket id across
    * partition directories), while an equality/IN predicate on the
    * partition columns prunes whole directories before any file is
    * opened — the layout for change-localized rediffs.
    */
  def bucketizeKeysPartitioned(df: DataFrame, table: String,
      partitionCols: Seq[String], keys: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    val loc = new org.apache.hadoop.fs.Path(
      org.apache.spark.sql.graft.Bridge.tableLocation(spark, table))
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    val wp = if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
    wp.bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Join two tables previously bucketized on the same key with the same
    * bucket count — plans as a shuffle-free (zipped-bucket) join.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
