package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs batched
  * per partition (the JVM analogue of `mapInPandas` — one decoder
  * instance per partition, streaming over rows, never materializing the
  * partition).
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment): [[FeatureExtractor.decodeStub]] derives deterministic
  * fake "features" from the raw bytes. The Spark-side plumbing — schema,
  * binary payloads, partition-batched UDF shape, feature schema — is real
  * and tested; swapping in a real decoder only changes the stub body.
  */
object Multimodal {

  /** An opaque media row: payload bytes + typed metadata. */
  final case class MediaRecord(
      id: Long,
      payload: Array[Byte],
      format: String,
      width_hint: Long)

  /** Extracted features (decode stub output). */
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      payload_md5: String,
      byte_sum: Long,
      mean_byte: Double)

  /** Wrap the documents table as a media corpus: each text's UTF-8 bytes
    * stand in for an image/audio blob (real pipelines read the blob
    * column straight from parquet).
    */
  def toMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("id"),
        col("text").cast("binary").as("payload"),
        lit("text/fake-image").as("format"),
        col("n_chars").as("width_hint"))
      .as[MediaRecord]
  }

  object FeatureExtractor extends Serializable {
    /** STUB decode: deterministic byte statistics standing in for a real
      * image decode + feature extraction. Replace with a codec call to
      * productionize; the signature (bytes ⇒ features) is the contract.
      */
    def decodeStub(m: MediaRecord): MediaFeatures = {
      val md5hex = MessageDigest.getInstance("MD5").digest(m.payload)
        .map("%02x".format(_)).mkString
      var sum = 0L
      var i = 0
      while (i < m.payload.length) { sum += m.payload(i) & 0xff; i += 1 }
      MediaFeatures(
        id = m.id,
        n_bytes = m.payload.length.toLong,
        payload_md5 = md5hex,
        byte_sum = sum,
        mean_byte = if (m.payload.isEmpty) 0.0
          else java.math.BigDecimal.valueOf(sum.toDouble / m.payload.length)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue)
    }
  }

  /** Partition-batched feature extraction: one extractor per partition
    * (where a real decoder would allocate its native context once),
    * streaming over the iterator.
    */
  def extractFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it => it.map(FeatureExtractor.decodeStub) }
  }

  /** One sampled "frame" of a media payload. */
  final case class MediaFrame(
      id: Long, frame_idx: Long, n_bytes: Long, frame_md5: String)

  /** Frame sampling: split each payload into `n` contiguous byte ranges
    * ("frames" — a real video sampler would seek keyframes; the slicing,
    * row fan-out, and per-partition decoder context are the production
    * shape). Output size is n× the row count — the schema/partitioning
    * consequence a 100 TB video pipeline actually has to plan for.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int)(
      implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition context
      it.flatMap { m =>
        val len = m.payload.length
        (0 until n).iterator.map { i =>
          val from = (i.toLong * len / n).toInt
          val until = ((i + 1).toLong * len / n).toInt
          val hex = md.digest(java.util.Arrays.copyOfRange(m.payload, from, until))
            .map("%02x".format(_)).mkString
          MediaFrame(m.id, i.toLong, (until - from).toLong, hex)
        }
      }
    }
  }
}
