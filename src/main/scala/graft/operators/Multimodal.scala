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
    // per-payload decode work must not serialize on a single scan split
    Spread.ensure(docs, "doc_id").select(
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

  /** Real-decode features for image payloads (see [[decodeImage]]). */
  final case class ImageFeatures(
      id: Long, width: Long, height: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL image decode via javax.imageio (pure-JVM readers: PNG, BMP,
    * GIF, JPEG — no native codec libraries needed): mean per-channel
    * intensity over all pixels. Returns None for payloads ImageIO cannot
    * decode, so mixed corpora degrade gracefully to the stub path.
    * Exact means: integer channel sums, HALF_UP rounding at 4 digits —
    * deterministic across partitionings.
    */
  def decodeImage(m: MediaRecord): Option[ImageFeatures] = {
    // ImageIO readers throw RuntimeExceptions (not just IOException) on
    // corrupt-but-recognized payloads; any decode failure means "drop"
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      var r = 0L; var g = 0L; var b = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = im.getRGB(x, y)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      def mean(s: Long): Double =
        java.math.BigDecimal.valueOf(s.toDouble / n)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
      ImageFeatures(m.id, w.toLong, h.toLong, mean(r), mean(g), mean(b))
    }
  }

  /** Partition-batched REAL image feature extraction — the same
    * mapPartitions shape as [[extractFeatures]], with undecodable
    * payloads dropped (flatMap over [[decodeImage]]).
    */
  def extractImageFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap(decodeImage))
  }

  /** Deterministic PNG fixture for an id: a (16+id%8)×(9+id%5) gradient
    * with rgb(x,y) = ((x·7+y)%256, (y·5)%256, (x+y·3)%256), PNG-encoded
    * in the executor. PNG is lossless, so decoding recovers the exact
    * pixels — which makes the ENTIRE encode → javax.imageio decode →
    * pixel-stats path checkable by an oracle that computes the expected
    * channel means from the gradient formula in closed form (no image
    * library needed on the oracle side).
    */
  def fixturePng(id: Long): Array[Byte] = {
    val w = (16 + id % 8).toInt
    val h = (9 + id % 5).toInt
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = ((x * 7 + y) % 256, (y * 5) % 256, (x + y * 3) % 256)
        im.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  /** Media corpus of [[fixturePng]] images for a set of ids — built
    * inside mapPartitions (the per-partition codec-context shape), so
    * the encode happens on executors, never the driver.
    */
  def fixtureImageCorpus(ids: Dataset[java.lang.Long])(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.mapPartitions(_.map { id =>
      MediaRecord(id, fixturePng(id), "image/png", (16 + id % 8))
    })
  }

  /** Features of a resized image (nearest-neighbor). */
  final case class ResizedFeatures(
      id: Long, src_w: Long, src_h: Long, w: Long, h: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Nearest-neighbor resize + channel stats: decode, sample the source
    * at `sx = (x·srcW) div w, sy = (y·srcH) div h` for each target
    * pixel (the EXACT integer mapping — no float scale factor, so the
    * sampled pixel set replays in closed form for synthetic fixtures),
    * then emit per-channel means over the w×h target. Nearest-neighbor
    * (not bilinear) is the deterministic choice: interpolation weights
    * are float-rounding-sensitive, pixel PICKS are pure integer
    * arithmetic. The normalization a training pipeline runs before
    * feature extraction, as the same partition-batched decode shape.
    */
  def resizeImage(m: MediaRecord, w: Int, h: Int): Option[ResizedFeatures] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val (sw, sh) = (im.getWidth, im.getHeight)
      var r = 0L; var g = 0L; var b = 0L
      var y = 0
      while (y < h) {
        val sy = y * sh / h
        var x = 0
        while (x < w) {
          val sx = x * sw / w
          val p = im.getRGB(sx, sy)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      def mean(s: Long): Double =
        java.math.BigDecimal.valueOf(s.toDouble / n)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
      ResizedFeatures(m.id, sw.toLong, sh.toLong, w.toLong, h.toLong,
        mean(r), mean(g), mean(b))
    }
  }

  /** Partition-batched resize — the [[extractImageFeatures]] shape with
    * a target geometry; undecodable payloads are dropped.
    */
  def resizeFeatures(media: Dataset[MediaRecord], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[ResizedFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap(resizeImage(_, w, h)))
  }

  /** 64-bit perceptual hash of an image (two 32-bit words, the
    * [[graft.operators.Dedup.hammingPairs64]] signature shape).
    */
  final case class PerceptualHash(id: Long, ph_hi: Long, ph_lo: Long)

  /** Average-hash (aHash) perceptual fingerprint: decode, nearest-
    * neighbor downsample to 8×8 with the EXACT integer mapping of
    * [[resizeImage]] (`sx = (x·srcW) div 8`), integer luma
    * `299·r + 587·g + 114·b` (no division — the scale cancels in the
    * mean comparison), bit (y·8+x) set iff `64·luma > Σluma` (strictly
    * above the mean, as an exact integer cross-multiplication — no
    * float mean, no rounding mode to disagree on). Near-identical
    * frames land within small Hamming distance; re-encodes of the same
    * frame hash identically. Pure integer end-to-end, so an oracle
    * replays the full decode→hash path in closed form on synthetic
    * fixtures.
    */
  def perceptualHash(m: MediaRecord): Option[PerceptualHash] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val (sw, sh) = (im.getWidth, im.getHeight)
      val luma = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < 8) {
        val sy = y * sh / 8
        var x = 0
        while (x < 8) {
          val sx = x * sw / 8
          val p = im.getRGB(sx, sy)
          val l = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
            114L * (p & 0xff)
          luma(y * 8 + x) = l
          total += l
          x += 1
        }
        y += 1
      }
      var hi = 0L; var lo = 0L
      var i = 0
      while (i < 64) {
        if (64L * luma(i) > total) {
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        i += 1
      }
      PerceptualHash(m.id, hi, lo)
    }
  }

  /** Partition-batched perceptual hashing — the [[extractImageFeatures]]
    * shape; undecodable payloads are dropped. Feed the result (renamed
    * to `id`/`hi`/`lo`) to [[graft.operators.Dedup.hammingPairs64]] for
    * frame-level near-dup pairs.
    */
  def perceptualHashes(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[PerceptualHash] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap(perceptualHash))
  }

  /** Difference-hash (dHash) perceptual fingerprint — [[perceptualHash]]'s
    * gradient-based sibling (and the standard second vote in a
    * perceptual-dedup ensemble: aHash thresholds against the global
    * mean, dHash against the horizontal NEIGHBOR, so they fail on
    * different image classes): 9×8 nearest-neighbor downsample with the
    * exact integer mapping `sx = (x·srcW) div 9`, integer luma, bit
    * (y·8+x) set iff luma(x+1, y) > luma(x, y). Same pure-integer
    * contract — an oracle replays decode→downsample→compare in closed
    * form on the gradient fixtures.
    */
  def differenceHash(m: MediaRecord): Option[PerceptualHash] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val (sw, sh) = (im.getWidth, im.getHeight)
      def luma(x: Int, y: Int): Long = {
        val p = im.getRGB(x * sw / 9, y * sh / 8)
        299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
      }
      var hi = 0L; var lo = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (luma(x + 1, y) > luma(x, y)) {
            val i = y * 8 + x
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          x += 1
        }
        y += 1
      }
      PerceptualHash(m.id, hi, lo)
    }
  }

  /** Partition-batched [[differenceHash]] — same shape as
    * [[perceptualHashes]].
    */
  def differenceHashes(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[PerceptualHash] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap(differenceHash))
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

  // ---- audio: REAL PCM/WAV decode (pure JVM — PCM is a RIFF header
  // walk + little-endian int16s; no codec library involved) ----------

  /** Deterministic 16-bit PCM mono 8 kHz WAV fixture: an integer
    * sawtooth with id-dependent period and amplitude plus a 256-sample
    * silent tail. sample(t) = ((t mod p)·2·amp) div p − amp for
    * t < n−256, else 0 — pure integer arithmetic, so the whole
    * waveform replays in CLOSED FORM in SQL: the oracle never touches
    * the WAV bytes, and agreement proves the RIFF encode → parse round
    * trip plus the framed feature math end to end.
    */
  def fixtureWav(id: Long): Array[Byte] = {
    val p = 32L + (id % 7) * 16
    val amp = 8000L + (id % 11) * 1000
    val n = (2048 + (id % 5) * 512).toInt
    val sr = 8000
    val data = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val v = if (t >= n - 256) 0L else ((t % p) * 2 * amp) / p - amp
      data(2 * t) = (v & 0xff).toByte
      data(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(sr).putInt(sr * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }

  /** Media corpus of [[fixtureWav]] clips, encoded on executors. */
  def fixtureWavCorpus(ids: Dataset[java.lang.Long])(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.mapPartitions(_.map { id =>
      MediaRecord(id, fixtureWav(id), "audio/wav", 8000L)
    })
  }

  /** Per-clip audio features from framed integer energy. */
  final case class AudioFeatures(
      id: Long, sample_rate: Long, n_samples: Long, n_frames: Long,
      total_abs: Long, peak: Long, silent_frames: Long)

  /** RIFF/WAV chunk walk → (sampleRate, int16 samples). Accepts only
    * PCM (format 1) mono 16-bit; anything else (or a malformed header)
    * returns None so mixed corpora degrade gracefully, the
    * [[decodeImage]] contract.
    */
  def decodeWav(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    def ascii(off: Int, s: String): Boolean =
      payload.length >= off + 4 &&
        new String(payload, off, 4, "US-ASCII") == s
    def le32(off: Int): Int =
      (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
        ((payload(off + 2) & 0xff) << 16) | ((payload(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    var off = 12
    var sr = -1
    var samples: Array[Short] = null
    while (off + 8 <= payload.length) {
      val size = le32(off + 4)
      if (ascii(off, "fmt ")) {
        if (le16(off + 8) != 1 || le16(off + 10) != 1 ||
          le16(off + 22) != 16) return None
        sr = le32(off + 12)
      } else if (ascii(off, "data")) {
        val n = math.min(size, payload.length - off - 8) / 2
        samples = Array.tabulate(n)(i => le16(off + 8 + 2 * i).toShort)
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (sr > 0 && samples != null) Some((sr, samples)) else None
  }

  /** Framed integer audio features, partition-batched like every other
    * decode here: per `frameLen`-sample frame the absolute-amplitude
    * energy; a frame is silent iff its energy is exactly 0 (the integer
    * definition both engines replay). Output covers every decodable
    * clip; undecodable payloads drop.
    */
  def audioFeatures(media: Dataset[MediaRecord], frameLen: Int = 256)(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    require(frameLen > 0, s"frameLen=$frameLen")
    media.mapPartitions(_.flatMap { m =>
      decodeWav(m.payload).map { case (sr, s) =>
        val nFrames = (s.length + frameLen - 1) / frameLen
        val energy = new Array[Long](math.max(nFrames, 1))
        var peak = 0L
        var total = 0L
        var t = 0
        while (t < s.length) {
          val a = math.abs(s(t).toLong)
          energy(t / frameLen) += a
          if (a > peak) peak = a
          total += a
          t += 1
        }
        AudioFeatures(m.id, sr.toLong, s.length.toLong, nFrames.toLong,
          total, peak,
          if (s.length == 0) 0L else energy.count(_ == 0L).toLong)
      }
    })
  }
}
