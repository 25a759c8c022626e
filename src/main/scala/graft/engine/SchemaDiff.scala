package graft.engine

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession

import graft.model.TableMeta
import graft.sources.DumpSource

/** Column-level schema evolution between two dumps — the DDL dimension
  * the reference collapses to whole-table CREATE/DROP (sync.py:246-258
  * compares only table NAME sets; a retyped or added column silently
  * rides along inside the CREATE text). With the typed parse
  * ([[TypedMode]] / DumpParser's colTypes) the engine can say WHAT
  * changed inside a table: columns added, dropped, retyped, and primary
  * key redefinitions — the review signal a schema migration needs before
  * anyone applies a generated sync script.
  *
  * Catalog metadata is O(tables × columns) — driver-side by design,
  * exactly like the reference's table-set comparison and SyncJob's
  * catalog handling; data volume never touches this path.
  */
object SchemaDiff {

  /** One schema change. `change` ∈ {column_added, column_dropped,
    * column_retyped, pk_changed}; the type fields carry the raw dump
    * type tokens (prod side / backup side) where applicable.
    */
  final case class SchemaChange(
      table: String,
      column: String,
      change: String,
      prodType: Option[String],
      backupType: Option[String])

  /** Changes that would turn `backup`'s schema into `prod`'s, for tables
    * present in both catalogs (tables in only one are CREATE/DROP —
    * already the sync core's concern, not repeated here). Deterministic
    * order: (table, column, change).
    */
  def changes(prod: ListMap[String, TableMeta],
      backup: ListMap[String, TableMeta]): Seq[SchemaChange] = {
    val common = prod.keySet.intersect(backup.keySet)
    common.toSeq.sorted.flatMap { t =>
      val (p, b) = (prod(t), backup(t))
      def types(m: TableMeta): Map[String, String] =
        m.columns.zipAll(m.colTypes, "", "").toMap
      val (pt, bt) = (types(p), types(b))
      val added = (p.columns.toSet -- b.columns).toSeq.sorted.map(c =>
        SchemaChange(t, c, "column_added", pt.get(c), None))
      val dropped = (b.columns.toSet -- p.columns).toSeq.sorted.map(c =>
        SchemaChange(t, c, "column_dropped", None, bt.get(c)))
      val retyped = p.columns.filter(c =>
          bt.contains(c) && pt.getOrElse(c, "") != bt.getOrElse(c, ""))
        .sorted.map(c =>
          SchemaChange(t, c, "column_retyped", pt.get(c), bt.get(c)))
      val pk = if (p.pkCols != b.pkCols)
        Seq(SchemaChange(t, p.pkCols.mkString("|"), "pk_changed",
          Some(p.pkCols.mkString("|")), Some(b.pkCols.mkString("|"))))
      else Nil
      added ++ dropped ++ retyped ++ pk
    }
  }

  /** [[changes]] straight from two dump files. */
  def diffDumps(spark: SparkSession, prodPath: String,
      backupPath: String): Seq[SchemaChange] = {
    val job = new SyncJob(spark)
    changes(
      job.catalog(DumpSource.statements(spark, prodPath)),
      job.catalog(DumpSource.statements(spark, backupPath)))
  }
}
