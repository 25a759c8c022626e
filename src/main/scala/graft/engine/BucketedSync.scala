package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Colocate
import graft.sources.DumpSource

/** One [[BucketedSync]] sidecar row per table (DDL order);
  * snapshot-level fields (firstCreatePos, fingerprint, buckets) are
  * repeated on every row — a handful of rows, and it keeps the sidecar
  * a single flat frame. Top-level so the encoder derivation stays on
  * the codegen path (a case class nested in an object trips the
  * generated accessor lookup and falls back to interpreted).
  */
private[engine] case class SnapshotCatRow(ord: Long, table: String,
    columns: Seq[String], pkCols: Seq[String], createStmt: String,
    colTypes: Seq[String], nRecords: Long, stmtEnd: Option[Long],
    firstCreatePos: Option[Long], fingerprint: String, buckets: Int)

/** Bucketed sync fast-path: persist a dump's parsed+deduped record frame
  * as a catalog table bucketed AND sorted on (table, pk). The write pays
  * the record shuffle ONCE; every later diff between two such snapshots
  * plans as a zipped-bucket sort-merge join with ZERO shuffle exchanges —
  * the repeated-sync amortization (nightly dumps against the same backup
  * snapshot, N×M dump-pair comparisons) at 100 TB, where the record
  * shuffle dominates the diff cost.
  *
  * The diff classification is identical to the streaming-parse path
  * (SyncJob.diffFrameInfo): BucketedSyncSpec asserts op-for-op equality
  * with SyncJob.run and an exchange-free physical plan.
  */
object BucketedSync {

  /** Columns of a persisted snapshot (SyncJob.records output order); the
    * replay INSERT text is derived at diff time from (table, vals)
    * (SyncSqlGenerator.rawInsertCol) — storing it would double the
    * snapshot's write volume.
    */
  private val RecordCols =
    Seq("table", "pk", "ord_off", "ord_row", "vals")

  /** Parse + dedup a dump and persist its record frame bucketed+sorted on
    * (table, pk), plus a `<name>_cat` sidecar with the dump's table SET —
    * a record frame alone cannot distinguish a missing table from an
    * empty one, and [[diff]] must restrict row ops to tables present in
    * BOTH snapshots (missing/extra tables are DDL concerns, exactly as
    * SyncJob classifies them). One-time cost ≈ one sync's parse half;
    * `buckets` must match between snapshots that will be diffed.
    *
    * The sidecar is a PLAIN parquet artifact (a handful of table-name
    * rows), not a catalog table: only the record frame needs bucket
    * metadata, and a catalog CTAS costs a metastore transaction — at
    * sf0.001 the metastore round-trips, not the data, dominated the
    * snapshot wall time.
    */
  def snapshot(spark: SparkSession, dumpPath: String, tableName: String,
      buckets: Int = 32, dbuckets: Int = 0): Unit = {
    import spark.implicits._
    val job = new SyncJob(spark)
    val stmts = DumpSource.statements(spark, dumpPath)
    val info = job.catalogInfo(stmts)
    val cat = info.metas
    val recs = job.records(stmts, cat).select(RecordCols.map(col): _*)
    if (dbuckets > 0)
      Colocate.bucketizeKeysPartitioned(
        recs.withColumn("dbucket", dbucketCol(dbuckets)),
        tableName, Seq("dbucket"), Seq("table", "pk"), buckets)
    else
      Colocate.bucketizeKeys(recs, tableName, Seq("table", "pk"), buckets)
    // Post-dedup row counts read back from the bucketed parquet (one
    // column-pruned scan) — [[graft.engine.SyncJob.syncFromBucketed]]
    // needs per-table counts for UNCHANGED tables without touching
    // their data at rediff time.
    val counts = spark.table(tableName).groupBy("table")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // Sidecar: the dump's full catalog in DDL order — enough to render
    // UPDATE/DELETE/INSERT statements and the reference-quirk CREATE
    // sections without re-parsing the dump. `ord` preserves the
    // ListMap/DDL insertion order the script sections depend on.
    cat.toSeq.zipWithIndex.map { case ((t, m), i) =>
      SnapshotCatRow(i.toLong, t, m.columns, m.pkCols, m.createStmt,
        m.colTypes, counts.getOrElse(t, 0L),
        info.stmtEnd.get(t), info.firstCreatePos,
        dumpFingerprint(spark, dumpPath), buckets)
    }.toDF().coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(catPath(spark, tableName))
  }

  /** Path+size+mtime fingerprint of a dump file — the cheap staleness
    * test [[ensureSnapshot]] uses to decide whether an existing snapshot
    * can be reused for this dump (re-parsing to find out would cost the
    * very parse the snapshot exists to amortize).
    *
    * Stat'd through the Hadoop FileSystem, not java.nio: the dump parse
    * itself reads through Spark and resolves against the deployment FS
    * (HDFS, S3A, local), so a java.nio stat would throw on every
    * non-local dump URI — killing the `--state` gate exactly where the
    * amortization matters. The path component is the FS-qualified URI,
    * so the same bytes at file: vs hdfs: fingerprint differently
    * (correct — they are different sources that can diverge).
    *
    * UPGRADE NOTE (round 15 format change): the fingerprint moved from
    * java.nio absolute-path + millis to FS-qualified URI + Hadoop
    * mtime, so every sidecar written by earlier versions reads as
    * stale and re-snapshots ONCE on first use — a one-time re-parse
    * per snapshot, after which the new-format sidecar amortizes as
    * before. Accepted deliberately: silently trusting a legacy local
    * fingerprint would skip the parse on a dump whose identity the new
    * scheme can no longer confirm.
    */
  private def dumpFingerprint(spark: SparkSession,
      dumpPath: String): String = {
    val p = new org.apache.hadoop.fs.Path(dumpPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val st = fs.getFileStatus(p)
    s"${fs.makeQualified(p)}:${st.getLen}:${st.getModificationTime}"
  }

  /** Snapshot `dumpPath` as `tableName` unless an up-to-date snapshot
    * (matching path+size+mtime fingerprint) already exists. Returns true
    * if a new snapshot was written. This is the CLI `--state` entry: the
    * first sync pays the parse+shuffle, every later sync against an
    * unchanged dump reuses the bucketed files for an exchange-free,
    * changed-tables-only rediff.
    *
    * Snapshots survive JVM restarts: the bucketed files + sidecar live
    * under the (state-dir) warehouse, and a fresh session that finds a
    * current sidecar but no catalog entry re-registers the table as an
    * external bucketed table over the existing files — metadata-only,
    * no data touched.
    */
  def ensureSnapshot(spark: SparkSession, dumpPath: String,
      tableName: String, buckets: Int = 32): Boolean = {
    val sidecar: Option[(String, Int)] =
      try {
        spark.read.parquet(catPath(spark, tableName))
          .select("fingerprint", "buckets").limit(1)
          .collect().headOption
          .map(r => (r.getString(0), r.getInt(1)))
      } catch { case _: Exception => None }
    sidecar match {
      case Some((fp, bk)) if fp == dumpFingerprint(spark, dumpPath) =>
        if (!spark.catalog.tableExists(tableName))
          registerExisting(spark, tableName, bk)
        false
      case _ =>
        snapshot(spark, dumpPath, tableName, buckets)
        true
    }
  }

  /** Re-register an on-disk snapshot written by a previous session as an
    * external bucketed table: the record schema is fixed
    * ([[RecordCols]]), the files already follow the bucket-file naming
    * `saveAsTable` produced, so a CLUSTERED BY declaration over the same
    * location restores exchange-free diff plans without reading a byte.
    */
  private def registerExisting(spark: SparkSession, tableName: String,
      buckets: Int): Unit = {
    val loc = org.apache.spark.sql.graft.Bridge.tableLocation(spark, tableName)
    spark.sql(
      s"""CREATE TABLE `$tableName` (
         |  `table` STRING, `pk` STRING, `ord_off` BIGINT,
         |  `ord_row` INT, `vals` ARRAY<STRING>)
         |USING PARQUET
         |CLUSTERED BY (`table`, `pk`) SORTED BY (`table`, `pk`)
         |INTO $buckets BUCKETS
         |LOCATION '$loc'""".stripMargin)
  }

  /** The sidecar catalog restored to the shape SyncJob renders from:
    * DDL-ordered TableMeta map + the CREATE-section offsets.
    */
  private[engine] def catalogInfoOf(spark: SparkSession,
      tableName: String): SyncJob.SnapshotCatalog = {
    val rows = spark.read.parquet(catPath(spark, tableName))
      .orderBy("ord").collect()
    val metas = scala.collection.immutable.ListMap(rows.map { r =>
      r.getAs[String]("table") -> graft.model.TableMeta(
        r.getAs[String]("table"),
        r.getAs[Seq[String]]("columns").toIndexedSeq,
        r.getAs[Seq[String]]("pkCols").toIndexedSeq,
        r.getAs[String]("createStmt"),
        r.getAs[Seq[String]]("colTypes").toIndexedSeq)
    }: _*)
    val counts = rows.map(r =>
      r.getAs[String]("table") -> r.getAs[Long]("nRecords")).toMap
    val stmtEnd = rows.flatMap(r => Option(r.get(r.fieldIndex("stmtEnd")))
      .map(e => r.getAs[String]("table") -> e.asInstanceOf[Long])).toMap
    val firstCreate = rows.headOption.flatMap(r =>
      Option(r.get(r.fieldIndex("firstCreatePos"))).map(_.asInstanceOf[Long]))
    SyncJob.SnapshotCatalog(metas, counts, firstCreate, stmtEnd)
  }

  /** [[diffChanged]]'s joined frame plus the changed / common table
    * lists — what [[SyncJob.syncFromBucketed]] needs to assemble a full
    * script (stats for unchanged common tables come from the sidecar
    * counts, never their data).
    */
  private[engine] def diffChangedInfo(spark: SparkSession, prodTable: String,
      backupTable: String): (DataFrame, Seq[String], Seq[String]) = {
    import spark.implicits._
    val common = commonTables(spark, prodTable, backupTable)
    def recs(t: String): DataFrame = spark.table(t)
      .filter(col("table").isInCollection(common))
    def rowCol = concat_ws("", col("pk"), col("vals"))
    val changed = graft.operators.AntiEntropy
      .changedBuckets(recs(prodTable), recs(backupTable), col("table"), rowCol)
      .select("bucket").as[String].collect().toSeq
    (diffOn(spark, prodTable, backupTable, changed), changed, common)
  }

  /** Digest-bucket partition key: a deterministic function of
    * (table, pk), so the same row lands in the same directory in every
    * snapshot — the property that lets [[diffChangedBuckets]] compare
    * directories across snapshots.
    */
  private def dbucketCol(n: Int) =
    pmod(graft.functions.Portable.hash48(
      concat_ws("|", col("table"), col("pk"))), lit(n.toLong))

  /** Deterministic sidecar location under the warehouse dir. Written and
    * read only by this object (never resolved through the catalog — it is
    * not a table), and only ever touched via mode=Overwrite on its own
    * `<name>_cat` directory.
    */
  private def catPath(spark: SparkSession, tableName: String): String = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    wh.stripSuffix("/") + "/" + tableName.toLowerCase + "_cat"
  }

  /** Diff two bucketed snapshots: the sync core's full-outer join +
    * 3-way classification over the tables present in BOTH snapshots
    * (matching SyncJob's commonTables rule — tables in only one dump are
    * CREATE/DROP DDL, never row ops), planned without any Exchange
    * (bucket files ARE the (table, pk) partitioning on both sides; the
    * common-table restriction is a literal IN filter from the tiny
    * catalog sidecars, not a join).
    */
  def diff(spark: SparkSession, prodTable: String,
      backupTable: String): DataFrame =
    diffOn(spark, prodTable, backupTable,
      commonTables(spark, prodTable, backupTable))

  /** [[diff]] with a Merkle anti-entropy pre-filter
    * ([[graft.operators.AntiEntropy.changedBuckets]]): per-table
    * (count, digest) summaries — two cheap aggregates over the bucketed
    * snapshots — name the tables that actually differ, and the row-level
    * full-outer join runs ONLY over those (the table filter reaches the
    * snapshot scan, so unchanged tables' files are never row-diffed).
    * The nightly-sync shape at 100 TB: most tables don't change, and
    * rediff cost becomes O(changed tables), not O(snapshot).
    */
  def diffChanged(spark: SparkSession, prodTable: String,
      backupTable: String): DataFrame = {
    import spark.implicits._
    val common = commonTables(spark, prodTable, backupTable)
    def recs(t: String): DataFrame = spark.table(t)
      .filter(col("table").isInCollection(common))
    // row serialization for the digest: pk + vals under a separator that
    // cannot appear in parsed literals (vals are raw SQL tokens)
    def rowCol = concat_ws("", col("pk"), col("vals"))
    val changed = graft.operators.AntiEntropy
      .changedBuckets(recs(prodTable), recs(backupTable), col("table"), rowCol)
      .select("bucket").as[String].collect().toSeq
    diffOn(spark, prodTable, backupTable, changed)
  }

  /** [[diffChanged]] at DIGEST-BUCKET granularity for snapshots written
    * with `dbuckets > 0`: the anti-entropy summaries are keyed on the
    * `dbucket` PARTITION column, so the follow-up row diff filters
    * `dbucket IN (changed)` — a predicate on the partition key, which
    * prunes whole snapshot directories before a single file is opened
    * (table-granular [[diffChanged]] still scans every file of a huge
    * changed table; this localizes the rediff to the ~1/dbuckets slice
    * of it that actually changed). The 100 TB nightly shape: digest
    * aggregate over both snapshots, then a row diff that reads only
    * changed directories — I/O O(changed data + digest scan), shuffle
    * O(changed data) (and zero exchanges, since the bucket layout
    * survives directory partitioning).
    */
  def diffChangedBuckets(spark: SparkSession, prodTable: String,
      backupTable: String): DataFrame = {
    import spark.implicits._
    val common = commonTables(spark, prodTable, backupTable)
    def recs(t: String): DataFrame = spark.table(t)
      .filter(col("table").isInCollection(common))
    // the digest row must carry the table name: dbuckets span tables
    def rowCol = concat_ws("", col("table"), col("pk"), col("vals"))
    val changed = graft.operators.AntiEntropy
      .changedBuckets(recs(prodTable), recs(backupTable), col("dbucket"), rowCol)
      .select("bucket").as[Long].collect().toSeq
    if (changed.isEmpty)
      diffOn(spark, prodTable, backupTable, common, Some(lit(false)))
    else
      diffOn(spark, prodTable, backupTable, common,
        Some(col("dbucket").isInCollection(changed)))
  }

  private def commonTables(spark: SparkSession, prodTable: String,
      backupTable: String): Seq[String] = {
    import spark.implicits._
    def tablesOf(t: String): Set[String] =
      spark.read.parquet(catPath(spark, t)).select("table").as[String]
        .collect().toSet
    tablesOf(prodTable).intersect(tablesOf(backupTable)).toSeq
  }

  private def diffOn(spark: SparkSession, prodTable: String,
      backupTable: String, common: Seq[String],
      extraFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    def restrict(df: DataFrame): DataFrame = {
      val byTable = df.filter(col("table").isInCollection(common))
      extraFilter.fold(byTable)(byTable.filter)
    }
    val p = restrict(spark.table(prodTable))
      .select(col("table"), col("pk"),
      lit(true).as("p_present"),
      col("ord_off").as("p_ord_off"), col("ord_row").as("p_ord_row"),
      col("vals").as("p_vals"),
      graft.codegen.SyncSqlGenerator.rawInsertCol(col("table"), col("vals"))
        .as("p_raw"))
    val b = restrict(spark.table(backupTable))
      .select(col("table"), col("pk"),
      lit(true).as("b_present"),
      col("ord_off").as("b_ord_off"), col("ord_row").as("b_ord_row"),
      col("vals").as("b_vals"))
    p.join(b, Seq("table", "pk"), "full_outer")
      .withColumn("op",
        when(col("b_present").isNull, Differ.OP_INSERT)
          .when(col("p_present").isNull, Differ.OP_DELETE)
          .when(!(col("p_vals") <=> col("b_vals")), Differ.OP_UPDATE))
      .filter(col("op").isNotNull)
  }
}
