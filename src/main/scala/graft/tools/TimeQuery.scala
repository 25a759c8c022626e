package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: time queries exactly the way Bench does — full noop-sink
  * materialization (never `.count()`, which lets Catalyst prune expensive
  * final projections), cache cleared before each query's cold run, then
  * warm repeats in the same state Bench's warm pass sees.
  *
  * Usage: runMain graft.tools.TimeQuery <q1>[,<q2>,...] [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.Tables.lineitem(spark, sfDir).limit(1000).count()

    def materialize(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      graft.PendingRelease.drain() // same contract as Bench.materialize
    }

    names.foreach { name =>
      spark.catalog.clearCache()
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        materialize(SparkEntry.queries(name)(spark, sfDir))
        val label = if (i == 1) "cold" else s"warm$i"
        println(f"[timequery] $name $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
