package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** Streaming near-duplicate detection against a standing corpus index —
  * the ingest-time dedup gate of a training-data pipeline: every arriving
  * micro-batch of documents is probed for near-dups (MinHash-LSH,
  * exact-Jaccard verified) against everything ingested so far, then
  * joins the index itself.
  *
  * State layout (parquet under `stateDir`):
  *   shingles/  (id, shingle)          — the verify side of the index
  *   bands/     (id, band, band_key)   — the LSH probe side
  *   pairs/     (id_a, id_b, jac)      — append-only detected pairs
  *
  * Scale: per batch the candidate join fans out ONLY from the fresh
  * documents' band buckets ([[Dedup.minhashLshPairsFromFrames]] — never
  * corpus×corpus), so cost tracks the arrival size, not the corpus;
  * the index grows by O(batch) per batch. At 100 TB, bucket both index
  * tables by their join keys (shingle / (band, band_key)) so the verify
  * and probe joins co-locate without reshuffling the standing index —
  * the [[graft.operators.Colocate]] layout. Each unordered pair is
  * detected exactly once: by the batch that delivers its later member
  * (same-batch pairs via fresh×fresh) — the spec pins the accumulated
  * pair set equal to the batch operator over the full corpus.
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
    val lvl = StorageLevel.MEMORY_AND_DISK
    val shF = Dedup.hashedShingleTable(batch, idCol, textCol, shingleN)
      .persist(lvl)
    val bandsF = Dedup.lshBandsFrom(
      Dedup.minhashSignaturesFrom(shF, batch, idCol, textCol, numHashes,
        alreadyHashed = true), numHashes, bands).persist(lvl)
    try {
      val shPath = s"$stateDir/shingles"
      val bandsPath = s"$stateDir/bands"
      val haveIndex = new java.io.File(shPath).exists()
      val shC = if (haveIndex) spark.read.parquet(shPath) else shF.limit(0)
      val bandsC =
        if (haveIndex) spark.read.parquet(bandsPath) else bandsF.limit(0)
      // the pairs action must complete BEFORE the batch joins the index,
      // or its fresh×fresh pairs would also surface as fresh×corpus
      Dedup.minhashLshPairsFromFrames(shC, bandsC, shF, bandsF, threshold)
        .write.mode(SaveMode.Append).parquet(s"$stateDir/pairs")
      shF.write.mode(SaveMode.Append).parquet(shPath)
      bandsF.write.mode(SaveMode.Append).parquet(bandsPath)
    } finally { shF.unpersist(); bandsF.unpersist(); () }
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
