package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{SyncJob, TypedMode, BucketedSync}
import graft.sources.DumpSource

/** Scratch profiling main for round-4 perf work (not shipped surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val which = if (args.nonEmpty) args(0) else "q39"
    which match {
      case "q39" =>
        val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
        val outDir = s"/tmp/graft_typed_dumps_${sfName}_v${DumpGen.FormatVersion}"
        val (prod, backup) = time("generatePkKeyed") {
          DumpGen.generatePkKeyed(spark, sfDir, outDir, "orders", "o_orderkey")
        }
        val job = new SyncJob(spark)
        val stmtsP = DumpSource.statements(spark, prod.toString)
        println("PROF stmts partitions = " + stmtsP.rdd.getNumPartitions)
        time("stmts count P")(stmtsP.count())
        time("stmts count P again")(stmtsP.count())
        val catP = time("catalog P")(job.catalog(stmtsP))
        val recsP = job.records(stmtsP, catP)
        time("records P mat")(mat(recsP))
        val typedP = TypedMode.typedTable(recsP, catP("orders"))
        time("typed table P mat")(mat(typedP))
        // full query twice
        time("q39 full cold-ish")(mat(graft.queries.TypedQueries.q39(spark, sfDir)))
        time("q39 full warm")(mat(graft.queries.TypedQueries.q39(spark, sfDir)))
      case "snap" =>
        val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
        val cacheDir = s"/tmp/graft_bench_dumps_${sfName}_v${DumpGen.FormatVersion}"
        val prodPath = java.nio.file.Paths.get(cacheDir, "prod.sql")
        val backupPath = java.nio.file.Paths.get(cacheDir, "backup.sql")
        time("snapshot prod")(BucketedSync.snapshot(spark, prodPath.toString, "prof_bk_prod"))
        time("snapshot backup")(BucketedSync.snapshot(spark, backupPath.toString, "prof_bk_backup"))
        time("snapshot prod again")(BucketedSync.snapshot(spark, prodPath.toString, "prof_bk_prod"))
        // breakdown
        val job = new SyncJob(spark)
        val stmts = DumpSource.statements(spark, prodPath.toString)
        val cat = time("catalog")(job.catalog(stmts))
        val recs = job.records(stmts, cat)
        time("records mat (noop)")(mat(recs))
        time("rediff")(mat(BucketedSync.diff(spark, "prof_bk_prod", "prof_bk_backup")))
      case "sync" =>
        val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
        val cacheDir = s"/tmp/graft_bench_dumps_${sfName}_v${DumpGen.FormatVersion}"
        val prodPath = java.nio.file.Paths.get(cacheDir, "prod.sql").toString
        val backupPath = java.nio.file.Paths.get(cacheDir, "backup.sql").toString
        val job = new SyncJob(spark)
        val stmts = DumpSource.statements(spark, prodPath)
        println("PROF stmt partitions = " + stmts.rdd.getNumPartitions)
        time("stmts count")(stmts.count())
        val cat = time("catalog")(job.catalog(stmts))
        time("records mat")(mat(job.records(stmts, cat)))
        time("records mat again")(mat(job.records(stmts, cat)))
        time("syncCollected 1") {
          job.syncCollected(prodPath, backupPath, "prof")
        }
        time("syncCollected 2") {
          job.syncCollected(prodPath, backupPath, "prof")
        }
      case "q54ab" =>
        import org.apache.spark.sql.functions._
        def corpus(base: org.apache.spark.sql.DataFrame) = {
          val d = base.select(col("doc_id"), col("text"))
          d.unionByName(d.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" zq zq zq")).as("text")))
        }
        val raw = spark.read.parquet(s"$sfDir/documents.parquet")
        val pre = corpus(raw) // internal Dedup.spread repartitions post-union
        val post = corpus(graft.operators.Spread.ensure(raw, "doc_id"))
        def pairs(df: org.apache.spark.sql.DataFrame) =
          graft.operators.Dedup.simhashPairs(df, "doc_id", "text", 1)
            .orderBy("id_a", "id_b")
        time("q54 pre-style (spread after union) cold")(mat(pairs(pre)))
        time("q54 pre-style warm")(mat(pairs(pre)))
        time("q54 post-style (spread in loader) cold")(mat(pairs(post)))
        time("q54 post-style warm")(mat(pairs(post)))
      case "q54raw" =>
        val raw = spark.read.parquet(s"$sfDir/documents.parquet")
        def pairs(df: org.apache.spark.sql.DataFrame) =
          graft.operators.Dedup.simhashPairs(df, "doc_id", "text", 1)
            .orderBy("id_a", "id_b")
        time("q54 raw (no spread) cold")(mat(pairs(raw)))
        time("q54 raw (no spread) warm")(mat(pairs(raw)))
        val spreaded = graft.operators.Spread.ensure(raw, "doc_id")
        time("q54 spread cold")(mat(pairs(spreaded)))
        time("q54 spread warm")(mat(pairs(spreaded)))
      case "q204" =>
        // stage budget for the prefix-filter join: shingles, prefix,
        // candidates (with/without the positional filter), verify
        val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
        val corpus = d.unionByName(d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" zq zq zq")).as("text")))
        val sh = graft.operators.Dedup.hashedShingleTable(
          corpus, "doc_id", "text", 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("shingle table mat")(println("rows=" + sh.count()))
        val tPpm = 600000L
        val sz = sh.groupBy("id").agg(count(lit(1)).as("sz"))
        val dfq = sh.groupBy("shingle").agg(count(lit(1)).as("dfq"))
        time("sz+dfq aggs")(println(
          "docs=" + sz.count() + " shingles=" + dfq.count()))
        val pre = sh.join(dfq, "shingle")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("id").orderBy("dfq", "shingle")))
          .join(sz, "id")
          .filter(col("rn") <=
            col("sz") - expr(s"($tPpm * sz + 999999) div 1000000") + lit(1))
          .select("id", "shingle", "sz", "rn")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("prefix table mat")(println("prefix rows=" + pre.count()))
        val joined = pre.select(col("id").as("id_a"), col("shingle"),
            col("sz").as("sz_a"), col("rn").as("rn_a"))
          .join(pre.select(col("id").as("id_b"), col("shingle"),
            col("sz").as("sz_b"), col("rn").as("rn_b")), "shingle")
          .filter(col("id_a") < col("id_b") &&
            col("sz_a") * lit(tPpm) <= col("sz_b") * lit(1000000L) &&
            col("sz_b") * lit(tPpm) <= col("sz_a") * lit(1000000L))
        time("cand distinct (no positional)")(println("cand=" +
          joined.select("id_a", "id_b").distinct().count()))
        val ub = least(col("rn_a") - 1, col("rn_b") - 1) + lit(1) +
          least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b"))
        val alpha = expr(s"($tPpm * (sz_a + sz_b)" +
          s" + ${1000000L + tPpm} - 1) div ${1000000L + tPpm}")
        time("cand with positional")(println("cand_pos=" +
          joined.filter(ub >= alpha)
            .groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(min(ub).as("ubm")).filter(col("ubm") >= alpha).count()))
        time("full q204 (current impl)")(mat(
          graft.operators.Dedup.prefixFilterPairs(sh, tPpm, persist = false)))
        time("full q204 again")(mat(
          graft.operators.Dedup.prefixFilterPairs(sh, tPpm, persist = false)))
      case "q55" =>
        time("q55 cold")(mat(graft.SparkEntry.queries("q55_ann_pq")(spark, sfDir)))
        spark.catalog.clearCache()
        time("q55 warm")(mat(graft.SparkEntry.queries("q55_ann_pq")(spark, sfDir)))
      case name =>
        val fn = graft.SparkEntry.queries(name)
        time(s"$name cold")(mat(fn(spark, sfDir)))
        spark.catalog.clearCache()
        time(s"$name warm")(mat(fn(spark, sfDir)))
    }
    spark.stop()
  }
}
