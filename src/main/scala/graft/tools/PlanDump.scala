package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev helper: run one SparkEntry query and dump its final (AQE-resolved)
  * executed plan's join/exchange/aggregate/generate skeleton — the fast
  * way to confirm a broadcast fired or an exchange disappeared without
  * wading through the full tree.
  *
  *   runMain graft.tools.PlanDump q66_repeated_ngrams /root/testdata/sf0.01
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("=== plan skeleton ===")
    plan.linesIterator
      .filter(l => Seq("Exchange", "Join", "Aggregate", "Generate",
        "Scan", "Window").exists(l.contains))
      .foreach(println)
    spark.stop()
  }
}
