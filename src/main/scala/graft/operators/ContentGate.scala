package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Fingerprint gate for persisted derived artifacts (LM stores, MinHash
  * signature stores, ANN indexes): rebuild only when the SOURCE slice's
  * content fingerprint no longer matches the artifact's recorded tag —
  * steady-state pipelines pay the build once and every later run reads
  * the artifact, while a regenerated/edited corpus forces a rebuild
  * instead of silently serving stale derivations.
  *
  * The fingerprint is ONE cheap map-side-combined aggregate over the
  * slice: row count + id sum + order-free content-hash sum (a length
  * sum would miss equal-length edits). An empty slice fingerprints as
  * (0,0,0) — a legitimate steady-state event (no batch matched the
  * predicate yet), not an error.
  */
object ContentGate {

  // ---- Control-file I/O for persisted stores (FINGERPRINT, META) ----
  // Routed through Hadoop FileSystem, NOT java.nio: the store's data
  // files already go through Spark/Hadoop and resolve against the
  // deployment's default FS (HDFS, S3A, local), so a java.nio control
  // file would gate against a local shadow path on any non-local
  // deployment — the artifact would rebuild every run (or worse, serve
  // stale under a tag nobody rewrites). These helpers are the single
  // control-file path for every store family (prefix store, ANN index,
  // LM/sketch/gram stores).

  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsFor(p: HPath): FileSystem = p.getFileSystem(hadoopConf())

  /** `fs` without a client-side checksum wrapper: Hadoop's local
    * `file:` FS is a ChecksumFileSystem that drops a hidden
    * `.name.crc` sidecar next to every file it creates — fine for a
    * store's internal control files, wrong for user-facing script /
    * output paths that external tools glob. HDFS and S3A are not
    * checksum-wrapped client-side and pass through unchanged.
    */
  def rawFs(fs: FileSystem): FileSystem = fs match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  /** The UTF-8 contents of small control file `dir/name`, or None. */
  def readSmall(dir: String, name: String): Option[String] = {
    val p = new HPath(dir, name)
    val fs = fsFor(p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var r = in.read(buf)
        while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
        Some(new String(out.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  /** Write small control file `dir/name` (overwrite, parents created). */
  def writeSmall(dir: String, name: String, content: String): Unit = {
    val p = new HPath(dir, name)
    val fs = fsFor(p)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Write `dir/name` atomically: bytes land at a temp name and
    * `fs.rename` to the final one, so a READER racing this write can
    * never observe a half-written file — rename is atomic on HDFS, and
    * on S3A it is COPY+DELETE of whole objects (slower, but object
    * COPY is atomic, so no torn read either). Used for the FINGERPRINT
    * commit: the tag is the store's freshness witness, and a torn tag
    * would read as permanently stale (rebuild-every-run) or, worse,
    * accidentally equal a different slice's tag.
    *
    * The delete-before-rename below (FSes where rename won't clobber)
    * opens a brief NO-file window: a reader racing it sees a missing
    * FINGERPRINT, reads as stale, and starts a spurious rebuild. The
    * design tolerates that (rebuilds are idempotent overwrites keyed
    * by the same tag); it costs work, never correctness.
    * Writer-vs-writer races remain governed by [[ensure]]'s
    * single-writer contract.
    */
  def writeSmallAtomic(dir: String, name: String, content: String): Unit = {
    val p = new HPath(dir, name)
    val tmp = new HPath(dir, s".$name.tmp")
    val fs = fsFor(p)
    fs.mkdirs(p.getParent)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }

  /** Delete control file `dir/name` if present. */
  def deleteSmall(dir: String, name: String): Unit = {
    val p = new HPath(dir, name)
    val fs = fsFor(p)
    if (fs.exists(p)) { fs.delete(p, false); () }
  }

  /** Order-free content fingerprint of the rows of `df` matching
    * `pred`, as a stable tag string.
    */
  def tag(df: DataFrame, idCol: String, textCol: String,
      pred: Column): String =
    tag(df, col(idCol), col(textCol), pred)

  /** Column-expression form, for artifacts keyed on derived content
    * (e.g. a sketch store fingerprinting its value expression).
    *
    * Summands are reduced mod 1e8+7 BEFORE the sum: a raw
    * `sum(hash48(...))` carries ~2⁴⁸ per row and overflows Long (ANSI
    * throws) beyond ~32k rows — the fingerprint must survive any slice
    * size. The modular sum stays order-free and duplicate-count-
    * sensitive, overflows only past ~9·10¹⁰ rows per slice (no single
    * fingerprinted shard is that big — shard first), and two of the
    * three components colliding simultaneously on an edit is what the
    * count+id+content triple exists to prevent.
    */
  def tag(df: DataFrame, idCol: Column, contentCol: Column,
      pred: Column): String = {
    val m = lit(100000007L)
    val fp = df.filter(pred)
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(pmod(idCol.cast("long"), m)), lit(0L))
          .cast("long").as("si"),
        coalesce(sum(pmod(Portable.hash48(contentCol), m)), lit(0L))
          .cast("long").as("sh"))
      .collect().head
    s"${fp.getLong(0)},${fp.getLong(1)},${fp.getLong(2)}"
  }

  /** Run `build` only when `dir/FINGERPRINT` does not already hold
    * `tag`; record the tag after a successful build.
    *
    * The stale tag is DELETED before `build` runs: if the JVM dies
    * after a successful build but before the tag write, the artifact
    * would otherwise hold new data under the old tag — and a later
    * source revert to the previously-fingerprinted content would
    * report fresh and silently serve the wrong artifact. With the
    * delete-first ordering a crash window can only cost an extra
    * rebuild, never a stale-fresh match.
    *
    * Concurrency contract: ONE writer per store dir (the deployment
    * norm — a store is owned by the pipeline that derives it). The gate
    * is check-then-build without a lock, so two concurrent `ensure`
    * calls on the same stale dir both rebuild and the probes of one can
    * observe the other's half-written data files; serialize ensure
    * calls per dir if multiple driver processes share a store. The tag
    * COMMIT, however, is atomic ([[writeSmallAtomic]]): a reader racing
    * a writer sees either no FINGERPRINT (stale, rebuild) or a complete
    * one — never a torn tag.
    */
  def ensure(dir: String, tag: String)(build: => Unit): Unit = {
    val fresh = readSmall(dir, "FINGERPRINT").contains(tag)
    if (!fresh) {
      deleteSmall(dir, "FINGERPRINT")
      build
      writeSmallAtomic(dir, "FINGERPRINT", tag)
    }
  }

  /** Metadata freshness tag of a source FILE OR DIRECTORY: an order-free
    * modular sum over the recursive listing's (name-hash, length,
    * mtime) triples. O(files), not O(data) — the right gate for
    * immutable, rename-committed layouts (parquet), where any rewrite
    * changes mtime: steady-state runs pay a listing instead of a full
    * content scan. For stores whose source can be edited IN PLACE at
    * constant size+mtime, use the content [[tag]] instead.
    */
  def pathTag(spark: org.apache.spark.sql.SparkSession,
      path: String): String = {
    val m = 100000007L
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    var n = 0L; var sh = 0L; var sl = 0L; var st = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      n += 1
      sh = (sh + math.floorMod(
        f.getPath.getName.hashCode.toLong, m)) % m
      sl = (sl + math.floorMod(f.getLen, m)) % m
      st = (st + math.floorMod(f.getModificationTime, m)) % m
    }
    s"path:$n,$sh,$sl,$st"
  }

  /** The recorded tag of an existing artifact (for composing gates,
    * e.g. a merged store fingerprinted by its parts' tags).
    */
  def recordedTag(dir: String): String =
    readSmall(dir, "FINGERPRINT").getOrElse(
      throw new IllegalArgumentException(
        s"artifact $dir has no FINGERPRINT"))
}
