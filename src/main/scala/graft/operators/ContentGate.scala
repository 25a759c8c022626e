package graft.operators

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
    */
  def ensure(dir: String, tag: String)(build: => Unit): Unit = {
    val fpPath = java.nio.file.Paths.get(dir, "FINGERPRINT")
    val fresh = java.nio.file.Files.exists(fpPath) &&
      new String(java.nio.file.Files.readAllBytes(fpPath), "UTF-8") == tag
    if (!fresh) {
      java.nio.file.Files.deleteIfExists(fpPath)
      build
      java.nio.file.Files.createDirectories(fpPath.getParent)
      java.nio.file.Files.write(fpPath, tag.getBytes("UTF-8"))
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
  def recordedTag(dir: String): String = {
    val f = java.nio.file.Paths.get(dir, "FINGERPRINT")
    require(java.nio.file.Files.exists(f), s"artifact $dir has no FINGERPRINT")
    new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
  }
}
