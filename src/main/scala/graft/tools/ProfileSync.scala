package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.codegen.SyncSqlGenerator
import graft.engine.SyncJob

/** Dev tool: phase timing of the end-to-end sync (the bench's
  * sync_dump_diff metric). Usage: runMain graft.tools.ProfileSync <sfDir> [reps]
  */
object ProfileSync {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val sfName = Paths.get(sfDir).getFileName.toString
    val cacheDir = s"/tmp/graft_bench_dumps_${sfName}_v${DumpGen.FormatVersion}"
    val (prod, backup) =
      if (Files.exists(Paths.get(cacheDir, "prod.sql")))
        (Paths.get(cacheDir, "prod.sql"), Paths.get(cacheDir, "backup.sql"))
      else DumpGen.generate(spark, sfDir, cacheDir)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profsync] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"[profsync] --- rep $rep ---")
      val job = new SyncJob(spark)
      val outcome = t("run (diff+stats+collect)")(
        job.run(prod.toString, backup.toString))
      println(s"[profsync] ops collected: ${outcome.ops.size}")
      val script = t("assemble")(SyncSqlGenerator.assemble(outcome, "bench"))
      t("write")(Files.write(Paths.get(cacheDir, "prof_out.sql"),
        script.getBytes("UTF-8")))
      println(s"[profsync] script bytes: ${script.length}")
    }
    spark.stop()
  }
}
