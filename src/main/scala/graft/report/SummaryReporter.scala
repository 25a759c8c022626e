package graft.report

import java.util.Locale

import graft.engine.SyncOutcome

/** Console comparison summary — the reference's print_summary
  * (/root/reference/sync.py:439-506), driven by the collected stats.
  */
object SummaryReporter {

  private def comma(n: Long): String = String.format(Locale.US, "%,d", n)

  def render(o: SyncOutcome): String = {
    val out = Seq.newBuilder[String]
    out += "\n" + "=" * 60
    out += "DATABASE COMPARISON SUMMARY - FULL CRUD"
    out += "=" * 60

    var totalOperations = 0L
    if (o.missingTables.nonEmpty) {
      totalOperations += o.missingTables.size
      out += s"\n📋 Tables to CREATE: ${o.missingTables.size}"
      o.missingTables.foreach(t => out += s"  + $t")
    }
    if (o.extraTables.nonEmpty) {
      totalOperations += o.extraTables.size
      out += s"\n🗑️  Tables to DROP: ${o.extraTables.size}"
      o.extraTables.foreach(t => out += s"  - $t")
    }

    val perTable = o.commonTables.flatMap(t => o.stats.get(t))
    val totalInserts = perTable.map(_.missingCount).sum
    val totalUpdates = perTable.map(_.updatedCount).sum
    val totalDeletes = perTable.map(_.deletedCount).sum
    totalOperations += totalInserts + totalUpdates + totalDeletes

    if (totalInserts > 0) {
      out += s"\n➕ Records to INSERT: $totalInserts"
      perTable.filter(_.missingCount > 0).foreach(s =>
        out += s"  + ${s.table}: ${s.missingCount} records")
    }
    if (totalUpdates > 0) {
      out += s"\n✏️  Records to UPDATE: $totalUpdates"
      perTable.filter(_.updatedCount > 0).foreach(s =>
        out += s"  * ${s.table}: ${s.updatedCount} records")
    }
    if (totalDeletes > 0) {
      out += s"\n❌ Records to DELETE: $totalDeletes"
      perTable.filter(_.deletedCount > 0).foreach(s =>
        out += s"  - ${s.table}: ${s.deletedCount} records")
    }

    out += s"\n📊 Total CRUD operations: $totalOperations"
    out += (if (totalOperations == 0)
      "\n✅ No differences found! Backup and production are perfectly in sync."
    else
      s"\n⚠️  $totalOperations operations needed to sync backup with production.")

    if (perTable.nonEmpty) {
      out += "\n📈 Detailed Table Statistics:"
      out += "-" * 60
      perTable.foreach { s =>
        if (s.missingCount > 0 || s.updatedCount > 0 || s.deletedCount > 0) {
          out += s"  ${s.table}:"
          out += s"    Production: ${comma(s.productionCount)} records"
          out += s"    Backup: ${comma(s.backupCount)} records"
          out += s"    INSERT: ${comma(s.missingCount)} records"
          out += s"    UPDATE: ${comma(s.updatedCount)} records"
          out += s"    DELETE: ${comma(s.deletedCount)} records"
          out += ""
        }
      }
    }
    out.result().mkString("\n")
  }

  def print(o: SyncOutcome): Unit = println(render(o))
}
