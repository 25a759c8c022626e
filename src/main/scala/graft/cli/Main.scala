package graft.cli

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession

import graft.codegen.SyncSqlGenerator
import graft.engine.SyncJob
import graft.report.SummaryReporter

/** CLI with the reference's argv contract (/root/reference/sync.py:629-642):
  *
  *   graft.cli.Main [production.sql] [backup.sql] [output.sql]
  *
  * defaulting to prod.sql / backup.sql / database_sync_crud.sql.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val prodFile = if (args.length >= 2) args(0) else "prod.sql"
    val backupFile = if (args.length >= 2) args(1) else "backup.sql"
    val outputFile = if (args.length >= 3) args(2) else "database_sync_crud.sql"

    for (f <- Seq(prodFile, backupFile)) {
      if (!Files.exists(Paths.get(f))) {
        System.err.println(s"❌ Error: File not found: $f")
        sys.exit(1)
      }
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-sync")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      println(s"Comparing SQL dumps:\n  Production: $prodFile\n  Backup: $backupFile")
      val outcome = new SyncJob(spark).run(prodFile, backupFile)
      SummaryReporter.print(outcome)
      val now = LocalDateTime.now.format(
        DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      val script = SyncSqlGenerator.assemble(outcome, now)
      Files.write(Paths.get(outputFile), script.getBytes("UTF-8"))
      println(s"\n💾 Sync script written to: $outputFile")
    } finally spark.stop()
  }
}
