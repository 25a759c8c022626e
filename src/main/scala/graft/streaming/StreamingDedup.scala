package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-duplicate detection against a standing corpus index —
  * the ingest-time dedup gate of a training-data pipeline: every arriving
  * micro-batch of documents is probed for near-dups (MinHash-LSH,
  * exact-Jaccard verified) against everything ingested so far, then
  * joins the index itself.
  *
  * State layout (parquet under `stateDir`):
  *   docs/   (id, bk, toks, sz)   — ONE row per document: the LSH band
  *                                  keys (probe side, array of
  *                                  (band, band_key)) AND the distinct-
  *                                  shingle array + size (verify side);
  *                                  toks is null for docs shorter than
  *                                  the shingle width (banded via the
  *                                  whole-text fallback, dropped at
  *                                  verify — the batch operator's
  *                                  convention)
  *   pairs/  (id_a, id_b, jac)    — append-only detected pairs
  *
  * Scale: per batch the candidate join fans out ONLY from the fresh
  * documents' band buckets (never corpus×corpus), so cost tracks the
  * arrival size, not the corpus; the index grows by O(batch) per
  * batch. The round-11 artifact measured this entry at 805 rows/s —
  * 4-7× per-batch Spark actions/aggregates of fixed ~0.2-0.5 s
  * overhead each at the fixture size, NOT corpus recompute — so the
  * round-12 layout collapses state to one table (per-doc arrays are
  * doc-length bounded — the [[graft.operators.Dedup.prefixFilterPairsManaged]] verify
  * shape; set sizes ride along, so no per-batch corpus re-aggregation
  * either), computes the fresh side entirely per-row (zero shuffles),
  * and writes it FIRST: the pairs plan then reads the fresh rows back
  * from the files that write created and the corpus from the files
  * that existed before it, so "pairs see only the pre-batch index"
  * holds by explicit file split.
  * At 100 TB, bucket docs/ by id and band-partition a separate probe
  * projection so the candidate join co-locates without reshuffling the
  * standing index — the [[graft.operators.Colocate]] layout. Each
  * unordered pair is detected exactly once: by the batch that delivers
  * its later member (same-batch pairs via fresh×fresh) — the spec pins
  * the accumulated pair set equal to the batch operator over the full
  * corpus.
  *
  * Restart semantics: the index/pairs appends are not transactional with
  * the stream's checkpoint — a batch replayed after a crash mid-append
  * would double rows. A production deployment writes per-batch output
  * paths keyed by batchId (idempotent overwrite), or sinks pairs through
  * an exactly-once table format; kept simple here.
  */
object StreamingDedup {

  /** Probe one arriving batch against the index, append its pairs, then
    * extend the index with the batch.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): Unit = {
    if (batch.isEmpty) return
    import graft.functions.Portable
    val P = Portable.P
    // Fresh side computed ENTIRELY per-row — zero shuffles: the hashed
    // shingle array is bound ONCE per row behind a generator
    // (explode(array(...)) — projections don't collapse through
    // generators, so the tokenize→shingle→hash48 pipeline runs once,
    // not once per downstream reference — the ~20× trap documented on
    // graft.operators.Dedup.minhashSignatures), then each MinHash signature is an
    // array_min over the bound array and the band keys are plain
    // projections. Values are bit-identical to the grouped
    // minhashSignaturesFrom path (same per-element formula, min is
    // order-free; short docs fall back to hashing the whole lowercased
    // text exactly as there).
    val shArr = transform(
      Portable.shingles(Portable.tokens(col(textCol)), shingleN),
      s => Portable.hash48(s))
    val bound = batch.select(col(idCol).as("id"),
      lower(col(textCol)).as("_lt"), explode(array(shArr)).as("_toks"))
    val sigCols = (0 until numHashes).map { i =>
      def sig(h: Column) = (h % P * (i * 2 + 1) + lit(12289L) * i) % P
      when(size(col("_toks")) > 0,
        array_min(transform(col("_toks"), t => sig(t))))
        .otherwise(sig(Portable.hash48(col("_lt")))).as(s"s_$i")
    }
    val rpb = numHashes / bands
    val bandEntries = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_",
          (b * rpb until (b + 1) * rpb).map(i => col(s"s_$i")): _*)
          .as("band_key"))
    }
    // ONE per-doc state row: band keys (every doc — short docs band via
    // the whole-text fallback) plus the verify array (null toks for
    // short docs, dropped at verify exactly as the batch operator drops
    // sh-absent docs)
    val docsF = bound
      .select(col("id") +: col("_toks").as("_toks") +: sigCols: _*)
      .select(col("id"), array(bandEntries: _*).as("bk"),
        when(size(col("_toks")) > 0, col("_toks")).as("toks"),
        size(col("_toks")).cast("long").as("sz"))
    val docsPath = s"$stateDir/docs"
      def partFiles(): Set[String] = {
        val d = new java.io.File(docsPath)
        if (!d.exists()) Set.empty
        else d.listFiles().iterator
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath).toSet
      }
      // WRITE-FIRST: the append is the ONE materialization of the fresh
      // pipeline (no persist, no extra count job); the pairs plan then
      // reads the fresh side back from the files this write created and
      // the corpus side from the files that existed before it — an
      // explicit file split, so "pairs see only the pre-batch index"
      // holds by construction
      val before = partFiles()
      docsF.write.mode(SaveMode.Append).parquet(docsPath)
      val fresh = (partFiles() -- before).toSeq
      val docsFNew =
        if (fresh.isEmpty) docsF.limit(0)
        else spark.read.parquet(fresh: _*)
      val docsC =
        if (before.isEmpty) docsF.limit(0)
        else spark.read.parquet(before.toSeq: _*)
      def bandRows(docs: DataFrame): DataFrame =
        docs.select(col("id"), explode(col("bk")).as("e"))
          .select(col("id"), col("e.band").as("band"),
            col("e.band_key").as("band_key"))
      // candidates: fresh bands vs (corpus ∪ fresh) bands — identical
      // rule to graft.operators.Dedup.minhashLshPairsFromFrames
      val freshBands = bandRows(docsFNew)
      val cand = freshBands.as("a")
        .join(bandRows(docsC).unionByName(freshBands).as("b"),
          Seq("band", "band_key"))
        .filter(col("a.id") =!= col("b.id"))
        .select(least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b"))
        .distinct()
      // exact-Jaccard verify over the stored per-doc arrays: identical
      // values to the flat (id, shingle) join+count (the arrays ARE the
      // distinct shingle sets; null-toks docs drop here exactly as in
      // the batch operator)
      val arrs = docsC.unionByName(docsFNew)
        .filter(col("toks").isNotNull && col("sz") > 0)
      cand
        .join(arrs.select(col("id").as("id_a"), col("toks").as("ta"),
          col("sz").as("sz_a")), "id_a")
        .join(arrs.select(col("id").as("id_b"), col("toks").as("tb"),
          col("sz").as("sz_b")), "id_b")
        .withColumn("inter",
          size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .withColumn("jac", round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 4))
        .filter(col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
        .write.mode(SaveMode.Append).parquet(s"$stateDir/pairs")
  }

  /** Run the ingest gate over a streaming document frame. */
  def start(docs: DataFrame, stateDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): StreamingQuery = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, idCol, textCol,
          shingleN, numHashes, bands, threshold)
      }
      .start()
  }
}
