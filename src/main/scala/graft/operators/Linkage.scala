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

  /** Sorted-neighborhood linkage candidates (Hernández & Stolfo's SNM)
    * — the ORDER-based complement of equi-key blocking: records are
    * arranged in one global (key, id) total order and every pair within
    * `window` consecutive positions is a candidate, so near-misses that
    * share no exact block key (typo in the first character, swapped
    * words) still meet as sort neighbors. The verify step is one
    * codegen'd levenshtein per candidate, like [[linkEntities]].
    *
    * The global positions are computed WITHOUT a partition-less window
    * (the 100 TB sort-rank trap): a caller-supplied coarse `bucketFn`
    * over the key splits the order into ranges, row_number runs
    * PARTITIONED by bucket, and each bucket's global offset is the sum
    * of LOWER buckets' counts — a broadcast self-join on the bounded
    * bucket-count frame (O(B²) on B buckets, no window at all). Pairs
    * then meet through an equi-join on position (the window offsets
    * 1..window−1 are exploded, fan-out window−1) — positions are
    * globally exact, so candidates CROSS bucket boundaries and the
    * result is independent of the bucketing.
    *
    * @param bucketFn coarse order-preserving bucket of the key (e.g.
    *                 first character / length bucket); order
    *                 preservation is required — bucket(a) < bucket(b)
    *                 must imply a ≤ b — or positions are not a total
    *                 order of the keys
    * @return (id_a, id_b, key_a, key_b, dist), position-adjacent pairs
    *         with levenshtein(key_a, key_b) ≤ maxDist, id order = sort
    *         order
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      keyCol: String, bucketFn: Column => Column, window: Int,
      maxDist: Int): DataFrame = {
    require(window >= 2, s"window: $window")
    val base = df.select(col(idCol).as("id"), col(keyCol).as("k"),
      bucketFn(col(keyCol)).as("bkt"))
    val local = base.withColumn("r", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("bkt")
        .orderBy("k", "id")))
    val counts = base.groupBy("bkt").agg(count(lit(1)).as("c"))
    val offs = counts.select("bkt")
      .join(broadcast(counts.select(col("bkt").as("lo"), col("c"))),
        col("lo") < col("bkt"), "left")
      .groupBy("bkt").agg(coalesce(sum("c"), lit(0L)).as("off"))
    val pos = local.join(broadcast(offs), "bkt")
      .select(col("id"), col("k"), (col("r") + col("off")).as("pos"))
    val spark = df.sparkSession
    import spark.implicits._
    val deltas = broadcast((1 until window).map(_.toLong).toDF("d"))
    pos.select(col("id").as("id_a"), col("k").as("key_a"),
        col("pos").as("pa"))
      .crossJoin(deltas)
      .join(pos.select(col("id").as("id_b"), col("k").as("key_b"),
        col("pos").as("pb")), col("pb") === col("pa") + col("d"))
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "key_a", "key_b", "dist")
  }

  /** Blocking-quality audit — the two numbers that justify a blocking
    * scheme BEFORE a linkage run (Christen's reduction ratio and pairs
    * completeness): how many candidate pairs the blocks admit vs the
    * all-pairs total (reduction — the cost axis), and what fraction of
    * TRUE matching pairs land in the same block (completeness — the
    * recall ceiling: a true pair split across blocks can never be
    * found by [[linkEntities]] or any other blocked matcher).
    *
    * Everything is COMBINATORIAL on group sizes — Σ C(n,2) over
    * blocks, truth classes, and (block × truth) cells — three
    * aggregates to bounded domains; no pair is ever materialized, so
    * the audit itself never goes quadratic (the [[Dedup
    * .crossGroupDupMatrix]] counting trick applied to linkage).
    * C(n,2) products run in decimal(38,0): a 10¹⁰-row block prices
    * ~10¹⁹ pairs, past int64.
    *
    * @param blockKey caller's blocking key expression
    * @param truthKey ground-truth match key (pairs sharing it are the
    *                 true matches — a labeled sample or a trusted
    *                 natural key)
    * @return one row (n_records, n_blocks, cand_pairs, total_pairs,
    *         reduction_ppm, true_pairs, found_pairs, completeness_ppm);
    *         completeness_ppm = 10⁶ when there are no true pairs (an
    *         empty truth set constrains nothing).
    */
  def blockingAudit(df: DataFrame, blockKey: Column,
      truthKey: Column): DataFrame = {
    val base = df.select(blockKey.as("bk"), truthKey.as("tk"))
    def pairSum(out: String): Column =
      coalesce(sum(expr(
        "(cast(c as decimal(38,0)) * (c - 1)) div 2")),
        lit(0L).cast("decimal(38,0)")).as(out)
    val blocks = base.groupBy("bk").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_blocks"), sum("c").as("n_records"),
        pairSum("cand_pairs"))
    val truths = base.groupBy("tk").agg(count(lit(1)).as("c"))
      .agg(pairSum("true_pairs"))
    val cells = base.groupBy("bk", "tk").agg(count(lit(1)).as("c"))
      .agg(pairSum("found_pairs"))
    blocks.crossJoin(truths).crossJoin(cells)
      .withColumn("total_d", expr(
        "(cast(n_records as decimal(38,0)) * (n_records - 1)) div 2"))
      .select(col("n_records"), col("n_blocks"),
        col("cand_pairs").cast("long").as("cand_pairs"),
        col("total_d").cast("long").as("total_pairs"),
        expr("""case when n_records < 2 then cast(0 as bigint) else
          |  cast(((total_d - cand_pairs) * 1000000) div total_d
          |    as bigint) end""".stripMargin).as("reduction_ppm"),
        col("true_pairs").cast("long").as("true_pairs"),
        col("found_pairs").cast("long").as("found_pairs"),
        expr("""case when true_pairs = 0 then cast(1000000 as bigint) else
          |  cast((found_pairs * 1000000) div true_pairs as bigint) end"""
          .stripMargin).as("completeness_ppm"))
  }
}
