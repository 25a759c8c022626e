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
    */
  def tag(df: DataFrame, idCol: Column, contentCol: Column,
      pred: Column): String = {
    val fp = df.filter(pred)
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(idCol), lit(0L)).cast("long").as("si"),
        coalesce(sum(Portable.hash48(contentCol)), lit(0L))
          .cast("long").as("sh"))
      .collect().head
    s"${fp.getLong(0)},${fp.getLong(1)},${fp.getLong(2)}"
  }

  /** Run `build` only when `dir/FINGERPRINT` does not already hold
    * `tag`; record the tag after a successful build.
    */
  def ensure(dir: String, tag: String)(build: => Unit): Unit = {
    val fpPath = java.nio.file.Paths.get(dir, "FINGERPRINT")
    val fresh = java.nio.file.Files.exists(fpPath) &&
      new String(java.nio.file.Files.readAllBytes(fpPath), "UTF-8") == tag
    if (!fresh) {
      build
      java.nio.file.Files.createDirectories(fpPath.getParent)
      java.nio.file.Files.write(fpPath, tag.getBytes("UTF-8"))
    }
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
