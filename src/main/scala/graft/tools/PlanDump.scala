package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan of one SparkEntry query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark,
      if (args.length > 1) args(1) else "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println("=== EXCHANGES ===")
    p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan ExistingRDD") || l.contains("InMemory")).foreach(l => println(l.take(160)))
    spark.stop()
  }
}
