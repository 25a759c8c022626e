package graft.tools

import graft.SparkEntry
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val qs = if (args.nonEmpty) args.toSeq else Seq("q01_scan_filter","q02_agg_pricing","q03_join_agg","q06_table_diff")
    for (q <- qs) {
      println(s"===== $q =====")
      val budget = sys.env.get("EXPLAIN_LINES").map(_.toInt).getOrElse(40)
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).split("\n").take(budget).mkString("\n"))
    }
    spark.stop()
  }
}
