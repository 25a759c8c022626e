package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Persistent IVF+PQ ANN index — the train-once / probe-many deployment
  * form of [[Similarity.ivfPqTopK]], which retrains its quantizers on
  * every call. `build` fits the coarse quantizer and the PQ subspace
  * codebooks once, encodes the corpus, and persists everything as
  * parquet; `probe` answers top-k queries from the stored index without
  * touching the raw vectors again.
  *
  * Index layout under `indexDir`:
  *   coarse/    (cell, cvec)                — coarse centroids (tiny)
  *   books/     (mi, cell, cvec, cc)        — PQ codebooks (m·ksub rows)
  *   encoded/   (id, mi, code) PARTITIONED BY cell — corpus codes
  *   META       one text line: m,dsub,nlist,ksub
  *
  * Scale: `encoded` is hash-partitioned BY COARSE CELL on disk, and a
  * probe joins it against the broadcast (query, probed-cell) frame on
  * the partition column — dynamic partition pruning reads only the
  * nprobe cells a query needs, ~nprobe/nlist of the index, and the scan
  * carries m codes per vector instead of the full embedding. Probing is
  * then one broadcast join + one bounded aggregate + a per-query top-k
  * window: no shuffle of the index, ever. Rebuilds are full (codebooks
  * are corpus-distribution-dependent); appending new vectors without
  * refit = encode them with the stored books and append to `encoded` —
  * the streaming-ingest shape.
  *
  * Everything is the same exact-integer arithmetic as the q56 chain, so
  * a probe of a freshly-built index equals [[Similarity.ivfPqTopK]] on
  * the same inputs bit-for-bit (the spec pins it).
  */
object AnnIndex {

  /** Fit quantizers on the `trainLimit` lowest-id vectors, encode the
    * corpus, persist the index.
    */
  def build(base: DataFrame, idCol: String, vecCol: String, indexDir: String,
      nlist: Int = 16, m: Int = 16, ksub: Int = 64, kmeansIters: Int = 3,
      trainLimit: Int = 4096): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    val (qv, _) = Similarity.quantized(col(vecCol))
    val withQ = Spread.ensure(base, idCol)
      .select(col(idCol).as("id"), qv.as("q"))
    val train: Array[Array[Long]] = withQ
      .orderBy("id").limit(trainLimit)
      .select("q").collect().map(_.getSeq[Long](0).toArray)
    val coarse: Array[(Int, Seq[Long])] =
      Similarity.kmeansCentroids(train, nlist, kmeansIters)
        .zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    val pq = Similarity.PqModel.fromTrain(spark, train, m, ksub, kmeansIters)

    coarse.toSeq.toDF("cell", "cvec")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/coarse")
    pq.bookDf.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/books")
    val cells = withQ.withColumn("cell",
      element_at(Similarity.rankedCells(coarse, col("q"), 1), 1))
    pq.encode(withQ).join(cells.select("id", "cell"), "id")
      // cluster by cell BEFORE the partitioned write: otherwise every
      // shuffle task writes a sliver of every cell — tasks × nlist tiny
      // files (≈500 here) whose listing+footer reads then tax every
      // probe; clustered, the layout is one file per cell
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$indexDir/encoded")
    ContentGate.writeSmall(indexDir, "META", s"$m,${pq.dsub},$nlist,$ksub")
  }

  /** [[build]] behind a [[ContentGate]] content fingerprint — the
    * train-once / probe-many deployment form the scaladoc above
    * promises. The tag covers the corpus slice (count + id sum +
    * vector content hash) AND the quantizer geometry, so a regenerated
    * corpus or a parameter change forces a rebuild while steady-state
    * callers (every probe-serving job, every bench warm run) pay one
    * fingerprint aggregate instead of a kmeans fit + corpus encode.
    */
  /** Index FORMAT version, appended to the ContentGate tag. Bump this
    * whenever [[build]]'s arithmetic or on-disk layout changes: the tag
    * otherwise covers only corpus content + quantizer parameters, so a
    * pre-existing index dir (e.g. q107's fixed /tmp path) would report
    * fresh and serve a stale layout after a code change — surfacing as
    * a confusing oracle hash failure instead of a rebuild.
    */
  val FormatVersion = 2

  def ensureBuild(base: DataFrame, idCol: String, vecCol: String,
      indexDir: String, nlist: Int = 16, m: Int = 16, ksub: Int = 64,
      kmeansIters: Int = 3, trainLimit: Int = 4096): Unit = {
    val tag = ContentGate.tag(base, col(idCol),
        concat_ws(",", col(vecCol).cast("array<string>")), lit(true)) +
      s";nlist=$nlist,m=$m,ksub=$ksub,it=$kmeansIters,tl=$trainLimit" +
      s";v=$FormatVersion"
    ContentGate.ensure(indexDir, tag) {
      build(base, idCol, vecCol, indexDir, nlist, m, ksub, kmeansIters,
        trainLimit)
    }
  }

  /** Top-k neighbors of `queries` from a stored index. Output
    * (query_id, neighbor_id, rank, adc) — the [[Similarity.ivfPqTopK]]
    * shape.
    */
  def probe(spark: SparkSession, queries: DataFrame, idCol: String,
      vecCol: String, indexDir: String, k: Int, nprobe: Int = 4): DataFrame = {
    val meta = ContentGate.readSmall(indexDir, "META").getOrElse(
      throw new IllegalArgumentException(
        s"ANN index $indexDir has no META")).trim.split(",")
    val (m, dsub) = (meta(0).toInt, meta(1).toInt)
    val coarse: Array[(Int, Seq[Long])] =
      spark.read.parquet(s"$indexDir/coarse")
        .select("cell", "cvec").collect()
        .map(r => (r.getInt(0), r.getSeq[Long](1)))
        .sortBy(_._1)
    val pq = Similarity.PqModel(
      spark.read.parquet(s"$indexDir/books"), m, dsub)
    val enc = spark.read.parquet(s"$indexDir/encoded")

    val (qv, _) = Similarity.quantized(col(vecCol))
    val qWithQ = queries.select(col(idCol).as("query_id"), qv.as("qq"))
    val qprobe = qWithQ.withColumn("cell",
      explode(Similarity.rankedCells(coarse, col("qq"), nprobe)))
    // the index side joins on its PARTITION column against a broadcast —
    // dynamic partition pruning reads only the probed cells' directories
    val adc = enc
      .join(broadcast(qprobe.select("query_id", "cell")), "cell")
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(pq.queryTables(qWithQ).withColumnRenamed("cell", "qcell")),
        Seq("query_id", "mi"))
      .filter(col("code") === col("qcell"))
      .groupBy("query_id", "id").agg(sum(col("dt")).as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc").desc, col("id"))
    adc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("adc"))
  }

  /** Encode a batch of NEW vectors with the stored codebooks and append
    * it to the index — ingest without refit (codebooks stay fixed; refit
    * on drift is a rebuild). The batch is immediately probeable.
    */
  def append(spark: SparkSession, batch: DataFrame, idCol: String,
      vecCol: String, indexDir: String): Unit = {
    val meta = ContentGate.readSmall(indexDir, "META").getOrElse(
      throw new IllegalArgumentException(
        s"ANN index $indexDir has no META")).trim.split(",")
    val (m, dsub) = (meta(0).toInt, meta(1).toInt)
    val coarse: Array[(Int, Seq[Long])] =
      spark.read.parquet(s"$indexDir/coarse")
        .select("cell", "cvec").collect()
        .map(r => (r.getInt(0), r.getSeq[Long](1)))
        .sortBy(_._1)
    val pq = Similarity.PqModel(
      spark.read.parquet(s"$indexDir/books"), m, dsub)
    val (qv, _) = Similarity.quantized(col(vecCol))
    val withQ = batch.select(col(idCol).as("id"), qv.as("q"))
    val cells = withQ.withColumn("cell",
      element_at(Similarity.rankedCells(coarse, col("q"), 1), 1))
    pq.encode(withQ).join(cells.select("id", "cell"), "id")
      .repartition(col("cell")) // one file per touched cell (see build)
      .write.mode(SaveMode.Append).partitionBy("cell")
      .parquet(s"$indexDir/encoded")
  }

  /** Per-cell health report of a stored index — the maintenance
    * observable [[append]] deliberately lacks: ingest-without-refit
    * keeps codebooks fixed, so drifted arrivals pile into few cells
    * (every probe touching them scans more codes) and EVERY append
    * adds one parquet file per touched cell (listing + footer opens
    * tax every probe, the q108 small-files mode).
    *
    * Output (cell, n, share_pm, hot, n_files, action): `n` vectors in
    * the cell; `share_pm` = per-mille share in integer arithmetic
    * (n·1000 / total); `hot` = true iff n·nlist > [[HotCellFactor]]·total
    * (the cell holds over HotCellFactor× its fair share — integer
    * cross-multiplied, no float drift); `action` = "compact" when the
    * cell's directory has more than one file (the [[compactCells]]
    * work list), else "keep". All columns except `n_files`/`action`
    * are pure corpus+assignment arithmetic, so the DuckDB oracle
    * replays them from the same frozen-centroid assignment (q234).
    *
    * Scale: one groupBy over the code-only scan (never the raw
    * vectors) plus an O(nlist) driver-side directory listing — nlist
    * is small by construction (the coarse table is collected on every
    * probe already).
    */
  val HotCellFactor = 2L

  def cellAudit(spark: SparkSession, indexDir: String): DataFrame = {
    import spark.implicits._
    val meta = ContentGate.readSmall(indexDir, "META").getOrElse(
      throw new IllegalArgumentException(
        s"ANN index $indexDir has no META")).trim.split(",")
    val nlist = meta(2).toInt
    val encPath = new org.apache.hadoop.fs.Path(s"$indexDir/encoded")
    val fs = encPath.getFileSystem(spark.sessionState.newHadoopConf())
    val filesPerCell: Map[Int, Long] = fs.listStatus(encPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map { st =>
        st.getPath.getName.stripPrefix("cell=").toInt ->
          fs.listStatus(st.getPath)
            .count(f => f.getPath.getName.startsWith("part-")).toLong
      }.toMap
    // ONE distributed job (the per-cell count over the code-only scan),
    // then an nlist-bounded collect: the share/hot/action columns are
    // pure integer arithmetic over ≤ nlist rows, and deriving them
    // driver-side avoids re-executing the aggregate subplan for the
    // global total (an agg frame referenced twice re-runs its whole
    // scan) and any partition-less window
    val counts: Seq[(Int, Long)] = spark.read.parquet(s"$indexDir/encoded")
      // one row per (id, mi): count distinct ids per cell without
      // shuffling the codes — m is constant per index, divide instead
      .groupBy("cell").agg((count(lit(1)) / meta(0).toInt).cast("long").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val total = counts.map(_._2).sum
    counts.sortBy(_._1).map { case (cell, n) =>
      val files = filesPerCell.getOrElse(cell, 0L)
      (cell, n, n * 1000L / total,
        if (n * nlist > HotCellFactor * total) 1L else 0L,
        files, if (files > 1) "compact" else "keep")
    }.toDF("cell", "n", "share_pm", "hot", "n_files", "action")
  }

  /** Rewrite every multi-file cell directory back to one file per cell
    * — the remediation [[cellAudit]] plans. Contents are untouched
    * (codes and assignments are byte-identical), so a probe before and
    * after is bit-for-bit the same (the spec pins it); only the
    * listing/footer overhead appended batches accumulated is paid off.
    * Cells already at one file are NOT rewritten (their files are not
    * read or moved): the rewrite reads only the flagged cells and
    * overwrites only their partitions (dynamic partition overwrite).
    * Returns the compacted cell ids.
    */
  def compactCells(spark: SparkSession, indexDir: String): Seq[Int] = {
    val flagged = cellAudit(spark, indexDir)
      .filter(col("action") === "compact")
      .select("cell").collect().map(_.getInt(0)).toSeq
    if (flagged.nonEmpty) {
      // rewrite to a sibling temp dir, then swap per cell dir: Spark
      // refuses to overwrite a path it is reading, and the swap keeps
      // every cell readable at all times (a crash mid-swap leaves each
      // cell whole — some compacted, some not — and a rerun finishes)
      val tmp = s"$indexDir/encoded_compact_tmp"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sessionState.newHadoopConf())
      spark.read.parquet(s"$indexDir/encoded")
        .filter(col("cell").isin(flagged.map(Int.box): _*))
        .repartition(col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(tmp)
      flagged.foreach { c =>
        val dst = new org.apache.hadoop.fs.Path(s"$indexDir/encoded/cell=$c")
        val src = new org.apache.hadoop.fs.Path(s"$tmp/cell=$c")
        fs.delete(dst, true)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"rename $src -> $dst failed")
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    }
    flagged
  }
}
