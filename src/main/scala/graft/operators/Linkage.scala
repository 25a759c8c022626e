package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: map free-text entity mentions onto a canonical
  * entity catalog by blocked edit-distance matching — the
  * dirty-data-normalization step of a curation pipeline (vendor names,
  * product titles, author strings).
  *
  * Shape: candidate generation is an equi-join on a caller-supplied
  * blocking key (never an all-pairs cross join — the blocking key bounds
  * the candidate fan-out the same way LSH bands do in [[Dedup]]), the
  * verify step is one codegen'd `levenshtein` per candidate, and the
  * match decision is an argmin aggregate `min(struct(dist, entity))` —
  * lexicographic struct-min, so the tie-break (smallest distance, then
  * alphabetically first entity) is total and engine-independent.
  *
  * Scale: the canonical catalog of a linkage problem is characteristically
  * orders of magnitude smaller than the mention corpus, so the catalog
  * side broadcasts (`broadcastCatalog = true`, the default) and linkage
  * is a single map stage over the mentions plus one argmin aggregate —
  * no corpus shuffle. For a catalog too large to broadcast, pass `false`
  * and the same plan becomes a shuffled equi-join on the block key.
  */
object Linkage {

  /** Link each mention row to its best catalog entity.
    *
    * @param blockFn  blocking key derived from a name — must be stable
    *                 under the corruptions linkage is meant to absorb
    *                 (e.g. an uncorrupted field, a phonetic code, a
    *                 length-bucketed prefix)
    * @return (id, name, entity, dist) — mentions with no candidate within
    *         `maxDist` are dropped (inner semantics; left-join the result
    *         back for the unmatched set)
    */
  def linkEntities(mentions: DataFrame, idCol: String, nameCol: String,
      catalog: DataFrame, entityCol: String, blockFn: Column => Column,
      maxDist: Int, broadcastCatalog: Boolean = true): DataFrame = {
    val m = mentions.select(col(idCol).as("id"), col(nameCol).as("name"),
      blockFn(col(nameCol)).as("bk"))
    val c0 = catalog.select(col(entityCol).as("entity"),
      blockFn(col(entityCol)).as("bk"))
    val c = if (broadcastCatalog) broadcast(c0) else c0
    m.join(c, "bk")
      .withColumn("dist", levenshtein(col("name"), col("entity")).cast("long"))
      .filter(col("dist") <= maxDist)
      .groupBy("id", "name")
      .agg(min(struct(col("dist"), col("entity"))).as("best"))
      .select(col("id"), col("name"),
        col("best").getField("entity").as("entity"),
        col("best").getField("dist").as("dist"))
  }
}
