package graft.codegen

import graft.engine.{DiffOp, Differ, SyncOutcome}
import graft.model.TableMeta

/** Sync-script codegen + section-ordered assembly — byte-compatible with
  * the reference's generate_sync_sql (/root/reference/sync.py:304-437)
  * modulo the header timestamp (caller-supplied for testability).
  *
  * Section order is correctness-relevant (deletes before inserts avoid PK
  * collisions): DROP extra → CREATE missing → DELETE → UPDATE → INSERT →
  * stats comments. Within a section, tables iterate in production-catalog
  * order and rows in first-occurrence statement order — the reference's
  * dict-insertion orders.
  */
object SyncSqlGenerator {

  /** Column form of [[graft.parse.DumpParser.rawInsert]]: the replay
    * INSERT text derived from (table, vals) inside whole-stage codegen —
    * null when `vals` is null (the DELETE side of an outer join). Deriving
    * instead of carrying the text halves the bytes through the record
    * shuffle, the diff join, and persisted snapshots.
    */
  def rawInsertCol(table: org.apache.spark.sql.Column,
      vals: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(vals.isNotNull,
      concat(lit("INSERT INTO `"), table, lit("` VALUES ("),
        array_join(vals, ", "), lit(");")))
  }

  /** UPDATE: SET from production values excluding PK columns
    * (sync.py:181-183), WHERE from the backup record's PK values
    * (sync.py:186-192); empty if either clause is empty (sync.py:194).
    * Values are raw SQL literals and are spliced verbatim.
    */
  def updateStatement(meta: TableMeta, prodVals: Seq[String],
      backupVals: Seq[String]): String = {
    val pv = prodVals.toIndexedSeq
    val setClauses = meta.columns.zipWithIndex.collect {
      case (c, i) if i < pv.length && !meta.pkCols.contains(c) =>
        s"`$c` = ${pv(i)}"
    }
    val whereClauses = whereFromPk(meta, backupVals.toIndexedSeq)
    if (setClauses.nonEmpty && whereClauses.nonEmpty)
      s"UPDATE `${meta.name}` SET ${setClauses.mkString(", ")} WHERE ${whereClauses.mkString(" AND ")};"
    else ""
  }

  /** DELETE from the backup record's PK values (sync.py:199-215). */
  def deleteStatement(meta: TableMeta, backupVals: Seq[String]): String = {
    val whereClauses = whereFromPk(meta, backupVals.toIndexedSeq)
    if (whereClauses.nonEmpty)
      s"DELETE FROM `${meta.name}` WHERE ${whereClauses.mkString(" AND ")};"
    else ""
  }

  private def whereFromPk(meta: TableMeta, vals: IndexedSeq[String]): Seq[String] =
    meta.pkCols.flatMap { pk =>
      val idx = meta.columns.indexOf(pk)
      if (idx >= 0 && idx < vals.length) Some(s"`$pk` = ${vals(idx)}") else None
    }

  def renderOp(meta: TableMeta, backupMeta: TableMeta, op: DiffOp): String =
    op.op match {
      case Differ.OP_INSERT => op.rawInsert.getOrElse("")
      case Differ.OP_UPDATE =>
        updateStatement(meta, op.prodVals.getOrElse(Nil), op.backupVals.getOrElse(Nil))
      case Differ.OP_DELETE =>
        deleteStatement(backupMeta, op.backupVals.getOrElse(Nil))
      case _ => ""
    }

  /** Assemble the full script. `now` is the header timestamp string
    * ("yyyy-MM-dd HH:mm:ss").
    */
  def assemble(o: SyncOutcome, now: String): String = {
    val out = Seq.newBuilder[String]
    out += "-- SQL Sync Script - Full CRUD Support"
    out += "-- Generated to sync backup database with production"
    out += s"-- Generated on: $now"
    out += ""
    out += "-- WARNING: This script contains DELETE operations!"
    out += "-- Please review carefully before execution."
    out += "-- Consider backing up your backup database before running this script."
    out += ""

    if (o.extraTables.nonEmpty) {
      out += "-- DROP Extra Tables"
      out += "-- =================="
      out += "-- These tables exist in backup but not in production"
      out += ""
      o.extraTables.foreach { t =>
        out += s"-- Dropping extra table: $t"
        out += s"DROP TABLE IF EXISTS `$t`;"
        out += ""
      }
    }

    if (o.missingTables.nonEmpty) {
      out += "-- CREATE Missing Tables"
      out += "-- ====================="
      out += ""
      o.missingTables.foreach { t =>
        o.prodCatalog.get(t).foreach { meta =>
          out += s"-- Creating missing table: $t"
          out += s"DROP TABLE IF EXISTS `$t`;"
          // whole-file capture quirk (SyncOutcome.createSections);
          // fallback to the table's own DDL
          out += o.createSections.getOrElse(t, meta.createStmt)
          out += ""
        }
      }
    }

    // Per-table ops in production-catalog order, rows in first-occurrence
    // order of the relevant dump side.
    def opsFor(table: String, op: String): Seq[DiffOp] =
      o.ops.filter(d => d.table == table && d.op == op)
        .sortBy(d => (d.ordOff, d.ordRow))

    val deletes = o.commonTables.map(t => t -> opsFor(t, Differ.OP_DELETE))
      .filter(_._2.nonEmpty)
    val updates = o.commonTables.map(t => t -> opsFor(t, Differ.OP_UPDATE))
      .filter(_._2.nonEmpty)
    val inserts = o.commonTables.map(t => t -> opsFor(t, Differ.OP_INSERT))
      .filter(_._2.nonEmpty)

    if (deletes.nonEmpty) {
      out += "-- DELETE Records"
      out += "-- ==============="
      out += "-- Records that exist in backup but not in production"
      out += ""
      deletes.foreach { case (t, rows) =>
        out += s"-- Deleting ${rows.size} records from $t"
        rows.foreach { r =>
          val stmt = renderOp(o.prodCatalog(t), o.backupCatalog(t), r)
          if (stmt.nonEmpty) out += stmt
        }
        out += ""
      }
    }

    if (updates.nonEmpty) {
      out += "-- UPDATE Records"
      out += "-- ==============="
      out += "-- Records with different values between production and backup"
      out += ""
      updates.foreach { case (t, rows) =>
        out += s"-- Updating ${rows.size} records in $t"
        rows.foreach { r =>
          val stmt = renderOp(o.prodCatalog(t), o.backupCatalog(t), r)
          if (stmt.nonEmpty) out += stmt
        }
        out += ""
      }
    }

    if (inserts.nonEmpty) {
      out += "-- INSERT Missing Records"
      out += "-- ======================"
      out += "-- Records that exist in production but not in backup"
      out += ""
      inserts.foreach { case (t, rows) =>
        out += s"-- Inserting ${rows.size} missing records into $t"
        rows.foreach(r => out += r.rawInsert.getOrElse(""))
        out += ""
      }
    }

    out += "-- CRUD Statistics Summary"
    out += "-- ======================="
    out += ""

    var totalOperations = 0L
    if (o.missingTables.nonEmpty) {
      totalOperations += o.missingTables.size
      out += s"-- Tables to CREATE: ${o.missingTables.size}"
    }
    if (o.extraTables.nonEmpty) {
      totalOperations += o.extraTables.size
      out += s"-- Tables to DROP: ${o.extraTables.size}"
    }
    val totalInserts = inserts.map(_._2.size.toLong).sum
    val totalUpdates = updates.map(_._2.size.toLong).sum
    val totalDeletes = deletes.map(_._2.size.toLong).sum
    totalOperations += totalInserts + totalUpdates + totalDeletes

    out += s"-- Records to INSERT: $totalInserts"
    out += s"-- Records to UPDATE: $totalUpdates"
    out += s"-- Records to DELETE: $totalDeletes"
    out += s"-- Total operations: $totalOperations"
    out += ""

    out += "-- Per-Table Statistics:"
    o.commonTables.foreach { t =>
      o.stats.get(t).foreach { s =>
        if (s.missingCount > 0 || s.updatedCount > 0 || s.deletedCount > 0) {
          out += s"-- $t:"
          out += s"--   Production: ${s.productionCount} records"
          out += s"--   Backup: ${s.backupCount} records"
          out += s"--   To INSERT: ${s.missingCount} records"
          out += s"--   To UPDATE: ${s.updatedCount} records"
          out += s"--   To DELETE: ${s.deletedCount} records"
        }
      }
    }

    out.result().mkString("\n")
  }
}
