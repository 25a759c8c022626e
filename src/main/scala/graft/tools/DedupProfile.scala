package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the q21 jaccard-pairs paths — delete freely. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dp] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      println(s"=== $dir ===")
      val d = graft.Tables.documents(spark, dir).select("doc_id", "text")
      val corpus = d.unionByName(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" xq xq xq")).as("text")))
      val sh = graft.operators.Dedup.hashedShingleTable(
          corpus, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("shingle build")(println("  sh rows " + sh.count()))
      // old path stats
      val cap = 64L
      val hot = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("shingle")
      val index = sh.join(hot, Seq("shingle"), "left_anti")
      t("old: join volume") {
        val v = index.groupBy("shingle").agg(count(lit(1)).as("c"))
          .agg(sum(expr("c*(c-1)/2"))).head.getDouble(0)
        println(f"  old exploded pair rows ≈ $v%.0f")
      }
      t("old: full pairStats pairs") {
        val n = index.as("a").join(index.as("b"), Seq("shingle"))
          .filter(col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("inter")).count()
        println(s"  old candidate pairs $n")
      }
      t("old: end-to-end jaccard>=0.8") {
        // replicate the historical implementation end to end
        val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
        val n = index.as("a").join(index.as("b"), Seq("shingle"))
          .filter(col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
          .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
          .withColumn("jac", round(col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter")), 4))
          .filter(col("jac") >= 0.8).count()
        println(s"  old pass pairs $n")
      }
      t("new: end-to-end jaccard>=0.8") {
        val n = graft.operators.Dedup.jaccardPairs(sh, 0.8,
          maxDocFreq = Some(cap), persist = false).count()
        println(s"  new pass pairs $n")
      }
      sh.unpersist()
    }
    spark.stop()
  }
}
