package graft.engine

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{InsertRow, Stmt, TableMeta}
import graft.parse.DumpParser
import graft.sources.DumpSource

/** One classified sync operation with everything codegen needs.
  * `ordOff`/`ordRow` reproduce the reference's dict-insertion ordering:
  * the position of the PK's FIRST occurrence in the relevant dump
  * (production for INSERT/UPDATE, backup for DELETE) — values still come
  * from the LAST occurrence (last-wins upsert, sync.py:64-70).
  */
final case class DiffOp(
    table: String,
    pk: String,
    op: String,
    ordOff: Long,
    ordRow: Int,
    prodVals: Option[Seq[String]],
    backupVals: Option[Seq[String]],
    rawInsert: Option[String])

/** One rendered statement with its global sort key (distributed sink). */
final case class RenderedOp(
    table: String, pk: String, op: String, section: Int, tbl_idx: Int,
    ordOff: Long, ordRow: Int, stmt: String)

/** One line of the full sync script with its global sort key — the
  * distributed full-script sink unions banner/comment lines (driver-built,
  * O(tables)) with rendered statements (executor-built) and range-sorts.
  */
final case class ScriptLine(
    sec: Int, tbl: Int, off: Long, row: Int, sub: Int, line: String)

final case class TableStats(
    table: String,
    productionCount: Long,
    backupCount: Long,
    missingCount: Long,
    updatedCount: Long,
    deletedCount: Long,
    /** Estimated rendered-script bytes of this table's ops (value text
      * + per-(table, op) syntax skeleton rendered from the catalog —
      * an upper bound on actual script bytes) — rides the stats
      * aggregate for free and gates the collected script routes'
      * driver collect (see [[SyncJob.MaxCollectedBytes]]).
      */
    opBytes: Long = 0L)

/** Driver-side result of a sync comparison. `ops` holds every classified
  * operation (collected; the script output is ~1000× smaller than the
  * input dumps — for truly huge diffs use [[SyncJob.opsFrame]] and a
  * distributed write instead).
  */
final case class SyncOutcome(
    prodCatalog: ListMap[String, TableMeta],
    backupCatalog: ListMap[String, TableMeta],
    missingTables: Seq[String],
    extraTables: Seq[String],
    commonTables: Seq[String],
    stats: Map[String, TableStats],
    ops: Seq[DiffOp],
    /** Reference-quirk CREATE text per missing table: sync.py:43-45
      * re-searches `CREATE TABLE.*?`name`.*?ENGINE[^;]*;` over the WHOLE
      * dump, so a missing table that is not the dump's first table gets
      * everything from the first CREATE TABLE through its own DDL —
      * intermediate statements included. Empty map when no tables are
      * missing.
      */
    createSections: Map[String, String] = Map.empty)

/** The distributed dump-diff pipeline (reference lifecycle
  * sync.py:228-302 re-expressed as DataFrame jobs):
  *
  *   1. statement scan      — splittable `;\n`-delimited read, byte-offset
  *                            ordered ([[graft.sources.DumpSource]])
  *   2. catalog             — CREATE statements are a tiny fraction;
  *                            parsed on the driver in offset order
  *   3. record parse        — executor-side flatMap over INSERT
  *                            statements (quote-aware tokenizer)
  *   4. last-wins dedup     — window per (table, pk) ordered by position
  *   5. diff                — ONE full-outer join on (table, pk) for all
  *                            tables at once (single shuffle), null-safe
  *                            value-array comparison
  *   6. codegen             — executor-side statement rendering
  *
  * Scale: both record frames shuffle once on (table, pk); the dedup
  * window and the join reuse the same hash partitioning. No driver state
  * grows with input size except the final op collect.
  */
class SyncJob(spark: SparkSession) {
  import spark.implicits._

  /** Parse the catalog: collect only CREATE-shaped statements (cheap
    * distributed prefilter), then parse driver-side in offset order.
    */
  def catalog(stmts: Dataset[Stmt]): ListMap[String, TableMeta] =
    catalogInfo(stmts).metas

  /** Catalog + the byte positions needed to reproduce the reference's
    * whole-file CREATE-statement capture (see SyncOutcome.createSections):
    * the byte position of the first "CREATE TABLE" token in the file and
    * each table's own statement-end byte (exclusive of the '\n' after
    * ';').
    */
  private[graft] case class CatalogInfo(
      metas: ListMap[String, TableMeta],
      firstCreatePos: Option[Long],
      stmtEnd: Map[String, Long])

  private[graft] def catalogInfo(stmts: Dataset[Stmt]): CatalogInfo = {
    val creates = stmts
      .filter(col("text").rlike("(?is)^\\s*CREATE\\s+TABLE"))
      .orderBy("off")
      .collect()
    val metas = DumpParser.parseCatalog(creates.iterator.map(_.text))
    val firstCreatePos = creates.headOption.map { st =>
      val m = "(?i)CREATE TABLE".r.findFirstMatchIn(st.text)
      val charIdx = m.map(_.start).getOrElse(0)
      st.off + st.text.substring(0, charIdx).getBytes("UTF-8").length
    }
    val ends = creates.flatMap { st =>
      DumpParser.parseCreate(st.text).map(m =>
        m.name -> (st.off + st.text.getBytes("UTF-8").length + 1)) // + ';'
    }.toMap
    CatalogInfo(metas, firstCreatePos, ends)
  }

  /** Raw byte slice of a dump file (driver-side; used only to emit the
    * reference-quirk CREATE sections for missing tables).
    */
  private def fileSlice(path: String, start: Long, end: Long): String = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      raf.seek(start)
      val buf = new Array[Byte]((end - start).toInt)
      raf.readFully(buf)
      new String(buf, "UTF-8")
    } finally raf.close()
  }

  /** Parse + dedup the record frame of one dump:
    * (table, pk, ord_off, ord_row, vals) — one row per surviving
    * record, values from the PK's last statement, order key from its
    * first. The replay INSERT text is NOT carried (it is derived from
    * (table, vals) at render time, [[graft.codegen.SyncSqlGenerator
    * .rawInsertCol]]) — carrying it would double the window-shuffle bytes.
    */
  def records(stmts: Dataset[Stmt], cat: ListMap[String, TableMeta]): DataFrame = {
    val bc = spark.sparkContext.broadcast(cat)
    val rows: Dataset[InsertRow] = stmts.flatMap { st =>
      DumpParser.parseInsert(st.text) match {
        case Some((table, valuesPart)) if bc.value.contains(table) =>
          val meta = bc.value(table)
          DumpParser.splitValueSets(valuesPart).iterator.zipWithIndex.map {
            case (vs, i) =>
              val vals = DumpParser.splitValues(vs)
              InsertRow(table, st.off, i, DumpParser.pkString(vals, meta), vals)
          }.toSeq
        case _ => Nil // unknown table or no column list: ignored (sync.py:55,59)
      }
    }
    val part = Window.partitionBy("table", "pk")
    val lastFirst = part.orderBy(col("off").desc, col("row").desc)
    rows.toDF()
      .withColumn("rn", row_number().over(lastFirst))
      .withColumn("ord", min(struct(col("off"), col("row"))).over(part))
      .filter(col("rn") === 1)
      .select(col("table"), col("pk"),
        col("ord.off").as("ord_off"), col("ord.row").as("ord_row"),
        col("vals"))
  }

  /** The classified-op frame WITHOUT collecting: (table, pk, op, ordOff,
    * ordRow, stmt) with statements rendered executor-side. The at-scale
    * sink: `opsFrame(...).orderBy("section", "tbl_idx", "ordOff",
    * "ordRow")` written partitioned (see [[writeScriptDistributed]])
    * instead of the driver-assembled byte-parity script.
    */
  def opsFrame(prodPath: String, backupPath: String): DataFrame = {
    val (joined, prodCat, backupCat, commonTables) = diffFrame(prodPath, backupPath)
    renderedOps(joined, prodCat, backupCat, commonTables)
  }

  /** Executor-side statement rendering of an already-joined diff frame. */
  private def renderedOps(joined: DataFrame,
      prodCat: ListMap[String, TableMeta], backupCat: ListMap[String, TableMeta],
      commonTables: Seq[String]): DataFrame = {
    val tblIdx = commonTables.zipWithIndex.toMap
    val bcProd = spark.sparkContext.broadcast(prodCat)
    val bcBackup = spark.sparkContext.broadcast(backupCat)
    val bcIdx = spark.sparkContext.broadcast(tblIdx)
    joined.filter(col("op").isNotNull)
      .select(col("table"), col("pk"), col("op"),
        when(col("op") === Differ.OP_DELETE, col("b_ord_off"))
          .otherwise(col("p_ord_off")).as("ordOff"),
        when(col("op") === Differ.OP_DELETE, col("b_ord_row"))
          .otherwise(col("p_ord_row")).as("ordRow"),
        col("p_vals").as("prodVals"), col("b_vals").as("backupVals"),
        graft.codegen.SyncSqlGenerator.rawInsertCol(col("table"), col("p_vals"))
          .as("rawInsert"))
      .as[DiffOp]
      .map { op =>
        val stmt = graft.codegen.SyncSqlGenerator.renderOp(
          bcProd.value(op.table), bcBackup.value(op.table), op)
        val section = op.op match {
          case Differ.OP_DELETE => 3
          case Differ.OP_UPDATE => 4
          case _ => 5
        }
        RenderedOp(op.table, op.pk, op.op, section, bcIdx.value(op.table),
          op.ordOff, op.ordRow, stmt)
      }
      .toDF()
  }

  /** Distributed script sink for diffs too large to collect: statements
    * written as text, range-partitioned by the global sort key so file
    * NNNNN order concatenates to the reference's section/table/position
    * order (a manifest-free total order).
    */
  def writeScriptDistributed(prodPath: String, backupPath: String,
      outDir: String): Unit = {
    val (joined, prodInfo, backupCat, commonTables, cleanup) =
      diffFrameInfo(prodPath, backupPath)
    try renderedOps(joined, prodInfo.metas, backupCat, commonTables)
      .filter(length(col("stmt")) > 0)
      .orderBy("section", "tbl_idx", "ordOff", "ordRow")
      .select("stmt")
      .write.mode("overwrite").text(outDir)
    finally cleanup()
  }

  /** Distributed FULL-script sink: emits the complete sync script —
    * header, DROP/CREATE sections, per-table banners, statements, stats
    * summary — byte-identical to [[graft.codegen.SyncSqlGenerator.assemble]]
    * when the sorted part files are concatenated (modulo the text sink's
    * trailing newline). Statements are rendered executor-side and never
    * collected; banner/comment lines are O(tables) driver rows unioned in
    * with the same global sort key. This is the 100 TB path: no driver
    * state grows with the diff size.
    */
  def syncDistributed(prodPath: String, backupPath: String, outDir: String,
      now: String): SyncOutcome = {
    val (joined0, prodInfo, backupCat, commonTables, cleanup) =
      diffFrameInfo(prodPath, backupPath)
    val joined = joined0.cache()
    try {
      val outcome = summarize(joined, prodInfo, backupCat, commonTables, prodPath)
      scriptLineFrame(joined, prodInfo.metas, backupCat, commonTables,
        outcome, now)
        .write.mode("overwrite").text(outDir)
      outcome
    } finally { joined.unpersist(); cleanup() }
  }

  /** Size-routed sibling of [[syncDistributed]] with the SAME outDir
    * contract (sorted part files concatenate to the full script):
    * small diffs — op count at or under `maxCollectedOps` — collect the
    * ordered lines and write ONE part file through the Hadoop FS,
    * because a shuffle-partition-wide text sink spends more on task
    * launch + per-file commit than on the script at that size (the
    * measured small-tile floor of the distributed entry); large diffs
    * take [[syncDistributed]]'s executor-rendered write untouched. The
    * bytes are identical on both routes (DistributedSinkSpec pins
    * each against assemble), so consumers never care which fired.
    */
  def syncDistributedAuto(prodPath: String, backupPath: String,
      outDir: String, now: String,
      maxCollectedOps: Long = SyncJob.DefaultMaxCollectedOps): SyncOutcome = {
    val (joined0, prodInfo, backupCat, commonTables, cleanup) =
      diffFrameInfo(prodPath, backupPath)
    val joined = joined0.cache()
    try {
      val outcome = summarize(joined, prodInfo, backupCat, commonTables, prodPath)
      val nOps = outcome.stats.valuesIterator
        .map(s => s.missingCount + s.updatedCount + s.deletedCount).sum
      val lineFrame = scriptLineFrame(joined, prodInfo.metas, backupCat,
        commonTables, outcome, now)
      val estBytes = outcome.stats.valuesIterator.map(_.opBytes).sum
      if (nOps <= maxCollectedOps &&
          estBytes <= SyncJob.MaxCollectedBytes) {
        val lines = lineFrame.as[String].collect()
        val dirPath = new org.apache.hadoop.fs.Path(outDir)
        val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(dirPath, true) // overwrite semantics, like the text sink
        val out = fs.create(
          new org.apache.hadoop.fs.Path(dirPath, "part-00000"), true)
        try lines.foreach { l =>
          out.write(l.getBytes("UTF-8")); out.write('\n')
        } finally out.close()
      } else {
        lineFrame.write.mode("overwrite").text(outDir)
      }
      outcome
    } finally { joined.unpersist(); cleanup() }
  }

  /** The complete script as one globally-ordered single-column frame —
    * executor-rendered statements unioned with the O(tables) driver
    * banner rows under the (sec, tbl, off, row, sub) sort key. Shared by
    * the distributed text sink and the collected single-file path so the
    * byte-parity rules (notably: DELETE/UPDATE that render empty are
    * skipped, exactly as assemble does, while empty INSERT lines are
    * kept — assemble emits them bare) live in ONE place.
    */
  private def scriptLineFrame(joined: DataFrame,
      prodCat: ListMap[String, TableMeta], backupCat: ListMap[String, TableMeta],
      commonTables: Seq[String], outcome: SyncOutcome, now: String): DataFrame = {
    val stmts = renderedOps(joined, prodCat, backupCat, commonTables)
      .filter(col("op") === Differ.OP_INSERT || length(col("stmt")) > 0)
      .select(col("section").as("sec"), col("tbl_idx").as("tbl"),
        col("ordOff").as("off"), col("ordRow").as("row"),
        lit(0).as("sub"), col("stmt").as("line"))
    val banners = spark.createDataFrame(driverLines(outcome, now))
      .select("sec", "tbl", "off", "row", "sub", "line")
    banners.unionByName(stmts)
      .orderBy("sec", "tbl", "off", "row", "sub")
      .select("line")
  }

  /** Single-file sibling of [[syncDistributed]]: same executor-side
    * statement rendering and global sort, but the ordered lines are
    * collected and joined into one script string (byte-identical to
    * `SyncSqlGenerator.assemble(run(...), now)` — the golden spec pins
    * it). This is the fast default CLI path: the driver receives only
    * the final script bytes (~1000× smaller than the input dumps), never
    * the per-op value arrays, and does no per-op rendering loop.
    */
  def syncCollected(prodPath: String, backupPath: String,
      now: String): (SyncOutcome, String) = {
    val (joined0, prodInfo, backupCat, commonTables, cleanup) =
      diffFrameInfo(prodPath, backupPath)
    val joined = joined0.cache()
    try {
      val outcome = summarize(joined, prodInfo, backupCat, commonTables, prodPath)
      val lines = scriptLineFrame(joined, prodInfo.metas, backupCat,
        commonTables, outcome, now).as[String].collect()
      (outcome, lines.mkString("\n"))
    } finally { joined.unpersist(); cleanup() }
  }

  /** Size-routed sink: one diff (summarize's per-table stats are
    * O(tables) and already computed for the report), then the SAME
    * cached frame feeds either the collected single-file script (small
    * diffs — the reference-parity shape) or the distributed text sink
    * at `outPath + ".parts"` (op count above `maxCollectedOps` — the
    * 100 TB path, where collecting the script would bottleneck the
    * driver). Returns the outcome and, when distributed, the parts
    * directory; the script bytes are identical either way
    * (DistributedSinkSpec pins the concatenated parts against
    * assemble).
    */
  def syncAuto(prodPath: String, backupPath: String, outPath: String,
      now: String, maxCollectedOps: Long = SyncJob.DefaultMaxCollectedOps)
      : (SyncOutcome, Option[String]) = {
    val (joined0, prodInfo, backupCat, commonTables, cleanup) =
      diffFrameInfo(prodPath, backupPath)
    val joined = joined0.cache()
    try {
      val outcome = summarize(joined, prodInfo, backupCat, commonTables, prodPath)
      val nOps = outcome.stats.valuesIterator
        .map(s => s.missingCount + s.updatedCount + s.deletedCount).sum
      val lineFrame = scriptLineFrame(joined, prodInfo.metas, backupCat,
        commonTables, outcome, now)
      val estBytes = outcome.stats.valuesIterator.map(_.opBytes).sum
      if (nOps <= maxCollectedOps &&
          estBytes <= SyncJob.MaxCollectedBytes) {
        val lines = lineFrame.as[String].collect()
        // Hadoop FS, not java.nio: outPath resolves against the
        // deployment FS like every other sink in this file (the
        // distributed route below and syncDistributedAuto already do).
        // Raw (checksum-free) create — the final script is a
        // user-facing file, not internal state; no .crc sidecar.
        val p = new org.apache.hadoop.fs.Path(outPath)
        val fs = graft.operators.ContentGate.rawFs(
          p.getFileSystem(spark.sessionState.newHadoopConf()))
        val out = fs.create(p, true)
        try out.write(lines.mkString("\n").getBytes("UTF-8"))
        finally out.close()
        (outcome, None)
      } else {
        val partsDir = outPath + ".parts"
        lineFrame.write.mode("overwrite").text(partsDir)
        (outcome, Some(partsDir))
      }
    } finally { joined.unpersist(); cleanup() }
  }

  /** The non-statement lines of the full script (header, section banners,
    * per-table comments, stats tail) with their global sort keys —
    * line-for-line the same emission logic as SyncSqlGenerator.assemble.
    */
  private def driverLines(o: SyncOutcome, now: String): Seq[ScriptLine] = {
    val out = Seq.newBuilder[ScriptLine]
    var sub = 0
    def emit(sec: Int, tbl: Int, off: Long, row: Int, line: String): Unit = {
      out += ScriptLine(sec, tbl, off, row, sub, line); sub += 1
    }
    def banner(sec: Int, lines: String*): Unit =
      lines.foreach(emit(sec, -1, Long.MinValue, 0, _))

    banner(0,
      "-- SQL Sync Script - Full CRUD Support",
      "-- Generated to sync backup database with production",
      s"-- Generated on: $now",
      "",
      "-- WARNING: This script contains DELETE operations!",
      "-- Please review carefully before execution.",
      "-- Consider backing up your backup database before running this script.",
      "")

    if (o.extraTables.nonEmpty) {
      banner(1, "-- DROP Extra Tables", "-- ==================",
        "-- These tables exist in backup but not in production", "")
      o.extraTables.zipWithIndex.foreach { case (t, i) =>
        emit(1, i, 0, 0, s"-- Dropping extra table: $t")
        emit(1, i, 0, 1, s"DROP TABLE IF EXISTS `$t`;")
        emit(1, i, 0, 2, "")
      }
    }

    if (o.missingTables.nonEmpty) {
      banner(2, "-- CREATE Missing Tables", "-- =====================", "")
      o.missingTables.zipWithIndex.foreach { case (t, i) =>
        o.prodCatalog.get(t).foreach { meta =>
          emit(2, i, 0, 0, s"-- Creating missing table: $t")
          emit(2, i, 0, 1, s"DROP TABLE IF EXISTS `$t`;")
          emit(2, i, 0, 2, o.createSections.getOrElse(t, meta.createStmt))
          emit(2, i, 0, 3, "")
        }
      }
    }

    // op sections: banner if any table has ops, then per-table comment
    // before its statements and a blank line after them
    case class Sec(sec: Int, count: TableStats => Long, head: Seq[String],
        comment: (Long, String) => String)
    val secs = Seq(
      Sec(3, _.deletedCount,
        Seq("-- DELETE Records", "-- ===============",
          "-- Records that exist in backup but not in production", ""),
        (n, t) => s"-- Deleting $n records from $t"),
      Sec(4, _.updatedCount,
        Seq("-- UPDATE Records", "-- ===============",
          "-- Records with different values between production and backup", ""),
        (n, t) => s"-- Updating $n records in $t"),
      Sec(5, _.missingCount,
        Seq("-- INSERT Missing Records", "-- ======================",
          "-- Records that exist in production but not in backup", ""),
        (n, t) => s"-- Inserting $n missing records into $t"))
    secs.foreach { s =>
      val tables = o.commonTables.zipWithIndex
        .map { case (t, i) => (t, i, o.stats.get(t).map(s.count).getOrElse(0L)) }
        .filter(_._3 > 0)
      if (tables.nonEmpty) {
        banner(s.sec, s.head: _*)
        tables.foreach { case (t, i, n) =>
          emit(s.sec, i, Long.MinValue, 0, s.comment(n, t))
          emit(s.sec, i, Long.MaxValue, Int.MaxValue, "")
        }
      }
    }

    banner(6, "-- CRUD Statistics Summary", "-- =======================", "")
    var totalOperations = 0L
    if (o.missingTables.nonEmpty) {
      totalOperations += o.missingTables.size
      banner(6, s"-- Tables to CREATE: ${o.missingTables.size}")
    }
    if (o.extraTables.nonEmpty) {
      totalOperations += o.extraTables.size
      banner(6, s"-- Tables to DROP: ${o.extraTables.size}")
    }
    def total(f: TableStats => Long): Long =
      o.commonTables.flatMap(o.stats.get).map(f).sum
    val (ti, tu, td) =
      (total(_.missingCount), total(_.updatedCount), total(_.deletedCount))
    totalOperations += ti + tu + td
    banner(6,
      s"-- Records to INSERT: $ti",
      s"-- Records to UPDATE: $tu",
      s"-- Records to DELETE: $td",
      s"-- Total operations: $totalOperations",
      "",
      "-- Per-Table Statistics:")
    o.commonTables.foreach { t =>
      o.stats.get(t).foreach { s =>
        if (s.missingCount > 0 || s.updatedCount > 0 || s.deletedCount > 0)
          banner(6,
            s"-- $t:",
            s"--   Production: ${s.productionCount} records",
            s"--   Backup: ${s.backupCount} records",
            s"--   To INSERT: ${s.missingCount} records",
            s"--   To UPDATE: ${s.updatedCount} records",
            s"--   To DELETE: ${s.deletedCount} records")
      }
    }
    out.result()
  }

  /** Shared diff pipeline: cached full-outer joined frame + catalogs. */
  private def diffFrame(prodPath: String, backupPath: String)
      : (DataFrame, ListMap[String, TableMeta], ListMap[String, TableMeta], Seq[String]) = {
    val (j, pInfo, bCat, common, _) = diffFrameInfo(prodPath, backupPath,
      persistStmts = false)
    (j, pInfo.metas, bCat, common)
  }

  /** With `persistStmts` each dump's statement scan is cached
    * MEMORY_AND_DISK so the catalog pass and the record pass share one
    * text scan per dump instead of two; the returned thunk unpersists
    * them — call it once the joined frame has been fully consumed.
    */
  private def diffFrameInfo(prodPath: String, backupPath: String,
      persistStmts: Boolean = true)
      : (DataFrame, CatalogInfo, ListMap[String, TableMeta], Seq[String], () => Unit) = {
    def stmtsOf(path: String) = {
      val s = DumpSource.statements(spark, path)
      if (persistStmts)
        s.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else s
    }
    val prodStmts = stmtsOf(prodPath)
    val backupStmts = stmtsOf(backupPath)
    val cleanup = () => if (persistStmts) {
      prodStmts.unpersist(); backupStmts.unpersist(); ()
    }
    // the two catalog passes are independent driver-blocking collects —
    // run them as concurrent Spark jobs so both dumps' statement scans
    // (and their caches) fill the executor in parallel
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val prodInfoF = Future(catalogInfo(prodStmts))
    val backupCatF = Future(catalog(backupStmts))
    val prodInfo = Await.result(prodInfoF, Duration.Inf)
    val prodCat = prodInfo.metas
    val backupCat = Await.result(backupCatF, Duration.Inf)

    val commonTables = prodCat.keys.filter(backupCat.contains).toSeq

    val prod = records(prodStmts, prodCat)
      .filter(col("table").isInCollection(commonTables))
      .select(col("table"), col("pk"), lit(true).as("p_present"),
        col("ord_off").as("p_ord_off"), col("ord_row").as("p_ord_row"),
        col("vals").as("p_vals"))
    val backup = records(backupStmts, backupCat)
      .filter(col("table").isInCollection(commonTables))
      .select(col("table"), col("pk"), lit(true).as("b_present"),
        col("ord_off").as("b_ord_off"), col("ord_row").as("b_ord_row"),
        col("vals").as("b_vals"))

    val joined = prod.join(backup, Seq("table", "pk"), "full_outer")
      .withColumn("op",
        when(col("b_present").isNull, Differ.OP_INSERT)
          .when(col("p_present").isNull, Differ.OP_DELETE)
          .when(!(col("p_vals") <=> col("b_vals")), Differ.OP_UPDATE))
    (joined, prodInfo, backupCat, commonTables, cleanup)
  }

  /** Estimated rendered-script bytes of one diff row — value text plus
    * per-(table, op) syntax overhead; 0 for unchanged rows. Summed per
    * table inside [[summarize]]'s existing stats aggregate (zero extra
    * jobs — a first cut ran it as its own pass and the bench charged the
    * collected route ~1 s for it), the total gates the collected
    * routes' driver collect: a million WIDE rows is GBs of driver heap
    * even though the op count reads "small".
    *
    * The overhead is an upper bound on the statement's non-value bytes,
    * computed driver-side by rendering the REAL codegen skeleton with
    * empty values over the table's full column list (so column names,
    * backticks, keyword text, and clause separators are charged exactly
    * as [[graft.codegen.SyncSqlGenerator]] will emit them — a flat
    * 64 B/op under-charged wide tables with long column names by a
    * constant factor and let the gate route multi-×-256 MB scripts to
    * the driver). Each value additionally carries +2 B for its ", "
    * separator, which also covers rows with MORE values than the
    * catalog's column list (the reference replays those verbatim).
    * UPDATE's WHERE clause re-renders the backup PK values, but those
    * are byte-equal to the production PK values already in the sum
    * (equal pk join keys ⇒ equal total component text length), so the
    * value sum covers SET + WHERE without a pk term.
    */
  private[graft] def opBytesCol(prodCat: scala.collection.Map[String, TableMeta],
      backupCat: scala.collection.Map[String, TableMeta])
      : org.apache.spark.sql.Column = {
    import graft.codegen.SyncSqlGenerator
    def emptyVals(m: TableMeta) = IndexedSeq.fill(m.columns.length)("")
    val updOh: Map[String, Long] = prodCat.iterator.map { case (t, m) =>
      t -> (SyncSqlGenerator.updateStatement(m, emptyVals(m), emptyVals(m))
        .length + 1L)
    }.toMap
    val insOh: Map[String, Long] = prodCat.iterator.map { case (t, m) =>
      t -> (DumpParser.rawInsert(m.name, Nil).length + 1L)
    }.toMap
    val delOh: Map[String, Long] = backupCat.iterator.map { case (t, m) =>
      t -> (SyncSqlGenerator.deleteStatement(m, emptyVals(m)).length + 1L)
    }.toMap
    val oh =
      when(col("op") === Differ.OP_UPDATE,
        element_at(typedLit(updOh), col("table")))
        .when(col("op") === Differ.OP_DELETE,
          element_at(typedLit(delOh), col("table")))
        .otherwise(element_at(typedLit(insOh), col("table")))
    when(col("op").isNotNull,
      aggregate(coalesce(col("p_vals"), col("b_vals")),
        lit(0L),
        (acc, x) => acc + coalesce(length(x).cast("long"), lit(4L)) + lit(2L))
        + coalesce(oh, lit(64L)))
      .otherwise(lit(0L))
  }

  /** Everything in a SyncOutcome except the collected ops: table-set
    * diffs, reference-quirk CREATE sections, and the per-table stats
    * aggregation over the (cached) joined frame.
    */
  private def summarize(joined: DataFrame, prodInfo: CatalogInfo,
      backupCat: ListMap[String, TableMeta], commonTables: Seq[String],
      prodPath: String): SyncOutcome = {
    val prodCat = prodInfo.metas
    val missingTables = prodCat.keys.filterNot(backupCat.contains).toSeq
    val extraTables = backupCat.keys.filterNot(prodCat.contains).toSeq
    // reference-quirk CREATE sections (whole-file regex capture)
    val createSections = (prodInfo.firstCreatePos match {
      case Some(start) => missingTables.flatMap { t =>
        prodInfo.stmtEnd.get(t).map(end => t -> fileSlice(prodPath, start, end))
      }
      case None => Nil
    }).toMap
    val stats = joined.groupBy("table").agg(
      count(col("p_present")).as("productionCount"),
      count(col("b_present")).as("backupCount"),
      count(when(col("op") === Differ.OP_INSERT, 1)).as("missingCount"),
      count(when(col("op") === Differ.OP_UPDATE, 1)).as("updatedCount"),
      count(when(col("op") === Differ.OP_DELETE, 1)).as("deletedCount"),
      coalesce(sum(opBytesCol(prodCat, backupCat)), lit(0L)).as("opBytes"))
      .as[TableStats].collect()
      .map(s => s.table -> s).toMap
    SyncOutcome(prodCat, backupCat, missingTables, extraTables,
      commonTables, stats, Nil, createSections)
  }

  def run(prodPath: String, backupPath: String): SyncOutcome = {
    val (joined0, prodInfo, backupCat, commonTables, cleanup) =
      diffFrameInfo(prodPath, backupPath)
    val joined = joined0.cache()

    try {
      val outcome = summarize(joined, prodInfo, backupCat, commonTables, prodPath)

      val ops = joined.filter(col("op").isNotNull)
        .select(col("table"), col("pk"), col("op"),
          when(col("op") === Differ.OP_DELETE, col("b_ord_off"))
            .otherwise(col("p_ord_off")).as("ordOff"),
          when(col("op") === Differ.OP_DELETE, col("b_ord_row"))
            .otherwise(col("p_ord_row")).as("ordRow"),
          col("p_vals").as("prodVals"), col("b_vals").as("backupVals"),
          graft.codegen.SyncSqlGenerator.rawInsertCol(col("table"), col("p_vals"))
            .as("rawInsert"))
        .as[DiffOp].collect().toSeq

      outcome.copy(ops = ops)
    } finally { joined.unpersist(); cleanup() }
  }

  /** Full sync script straight from two [[BucketedSync]] snapshots —
    * the repeated-sync fast path behind the CLI `--state` flag. Byte-
    * identical to [[syncCollected]] on the same dump pair (the golden
    * spec pins it), but the dumps are never re-parsed: catalogs, table
    * counts, and CREATE-section offsets come from the snapshot
    * sidecars; the row diff is the Merkle-gated changed-tables-only
    * exchange-free bucket join ([[BucketedSync.diffChangedInfo]]).
    * Unchanged tables contribute their sidecar counts to the stats tail
    * without a single row read. `prodPath` is touched only to slice the
    * reference-quirk CREATE text when the backup is missing a table.
    */
  def syncFromBucketed(prodTable: String, backupTable: String,
      prodPath: String, now: String): (SyncOutcome, String) = {
    val prodSnap = BucketedSync.catalogInfoOf(spark, prodTable)
    val backupSnap = BucketedSync.catalogInfoOf(spark, backupTable)
    val prodCat = prodSnap.metas
    val backupCat = backupSnap.metas
    val commonTables = prodCat.keys.filter(backupCat.contains).toSeq
    val missingTables = prodCat.keys.filterNot(backupCat.contains).toSeq
    val extraTables = backupCat.keys.filterNot(prodCat.contains).toSeq
    val createSections = (prodSnap.firstCreatePos match {
      case Some(start) => missingTables.flatMap { t =>
        prodSnap.stmtEnd.get(t).map(end => t -> fileSlice(prodPath, start, end))
      }
      case None => Nil
    }).toMap
    val (joined0, _, _) =
      BucketedSync.diffChangedInfo(spark, prodTable, backupTable)
    val joined = joined0.cache()
    try {
      // op-type counts exist only for changed tables (the joined frame
      // is diff rows of changed tables); totals come from the sidecars
      val opStats = joined.groupBy("table").agg(
        count(when(col("op") === Differ.OP_INSERT, 1)).as("missingCount"),
        count(when(col("op") === Differ.OP_UPDATE, 1)).as("updatedCount"),
        count(when(col("op") === Differ.OP_DELETE, 1)).as("deletedCount"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val stats = commonTables.map { t =>
        val (mi, up, de) = opStats.getOrElse(t, (0L, 0L, 0L))
        t -> TableStats(t, prodSnap.counts.getOrElse(t, 0L),
          backupSnap.counts.getOrElse(t, 0L), mi, up, de)
      }.toMap
      val outcome = SyncOutcome(prodCat, backupCat, missingTables,
        extraTables, commonTables, stats, Nil, createSections)
      val lines = scriptLineFrame(joined, prodCat, backupCat,
        commonTables, outcome, now).as[String].collect()
      (outcome, lines.mkString("\n"))
    } finally { joined.unpersist(); () }
  }
}

object SyncJob {
  /** Collected-script routing threshold for [[SyncJob.syncAuto]]: above
    * this many classified ops the script goes through the distributed
    * text sink instead of a driver collect. 1M ops of TYPICAL width ≈
    * tens of MB of script bytes — comfortably a driver string, while
    * anything larger is the at-scale regime where the single-file
    * contract stops being the point. The op count alone is NOT a safe
    * driver-heap bound (a million wide rows renders to GBs), so the
    * auto routes also gate on [[MaxCollectedBytes]] via an estimated
    * rendered size; callers raising maxCollectedOps are raising op
    * COUNT only — the byte ceiling still applies.
    */
  val DefaultMaxCollectedOps: Long = 1000000L

  /** Hard byte ceiling for the collected routes: estimated rendered
    * script size above this always takes the distributed sink,
    * whatever the op count. 256 MB collected lines (plus the one
    * mkString copy on the single-file route) sits safely inside a
    * modest driver heap; the estimate is value-text length + 64 B/op
    * syntax overhead.
    */
  val MaxCollectedBytes: Long = 256L << 20

  /** A [[BucketedSync]] snapshot's sidecar restored for script
    * assembly: DDL-ordered catalog, per-table post-dedup record counts,
    * and the byte offsets that let [[SyncJob.syncFromBucketed]] emit
    * the reference-quirk CREATE sections by slicing the original dump.
    */
  final case class SnapshotCatalog(
      metas: ListMap[String, TableMeta],
      counts: Map[String, Long],
      firstCreatePos: Option[Long],
      stmtEnd: Map[String, Long])
}
