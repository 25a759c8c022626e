package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.operators.Dedup

/** Dev tool: stage-by-stage timing of the q21 Jaccard pipeline.
  * Usage: runMain graft.tools.ProfileDedup <sfDir>
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val d = Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus = d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zq zq zq")).as("text")))

    val sh = Dedup.shingleTable(corpus, "doc_id", "text", 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSh = t("build+persist shingles")(sh.count())
    println(s"[profile] shingle rows: $nSh, distinct docs: " + sh.select("id").distinct().count())

    val dfreq = t("doc-freq agg")(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .agg(max("df"), expr("approx_percentile(df, array(0.5, 0.9, 0.99, 0.999))"))
        .collect().mkString)
    println(s"[profile] df stats: $dfreq")

    val hot = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > 64).select("shingle")
    println("[profile] hot shingles (df>64): " + hot.count())
    val pruned = sh.join(hot, Seq("shingle"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("prune+persist")(pruned.count())

    val candRaw = pruned.as("a").join(pruned.as("b"), Seq("shingle"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    println("[profile] raw candidate pairs: " + t("cand raw count")(candRaw.count()))
    val cand = candRaw.distinct()
    println("[profile] distinct candidate pairs: " + t("cand distinct")(cand.count()))

    val full = Dedup.jaccardPairs(sh, 0.8, maxDocFreq = Some(64L), persist = false)
    println("[profile] final pairs: " + t("full pipeline (frames cached)")(full.count()))
    spark.stop()
  }
}
