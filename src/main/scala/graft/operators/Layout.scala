package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: keys that co-locate multi-dimensionally close
  * rows so file-level min/max statistics prune on EVERY clustered
  * dimension — at 100 TB the difference between scanning terabytes and
  * scanning megabytes for a 2-predicate query is whether the layout was
  * clustered on both columns (the z-order optimization of Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, expressed engine-side).
  */
object Layout {

  /** Compaction planning — the small-files remediation a 100 TB lake
    * runs continuously: per partition key, files already at or above
    * `targetBytes` are KEPT in place (rewriting them buys nothing), and
    * the small files are greedily packed into rewrite bins by cumulative
    * size (`bin = cum_before div target` — the [[Curate.packSequences]]
    * shape), so each closed bin's input reaches the target and a bin
    * never holds more than target + one file. Deterministic: files order
    * by name within their partition, so the same listing always yields
    * the same plan (replayable by the oracle). Output: (partCols...,
    * file, size, action `keep`/`rewrite`, bin — null for keeps).
    *
    * Scale: one window per partition key over its SMALL files only —
    * per-key sequential by design (a rewrite bin is a sequential
    * concatenation anyway); partition keys are the parallelism unit,
    * matching how compaction jobs shard. No shuffle beyond the window's
    * key exchange.
    */
  def compactionPlan(files: DataFrame, partCols: Seq[String], fileCol: Column,
      sizeCol: Column, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val f = files.select(partCols.map(col) :+ fileCol.as("file") :+
      sizeCol.cast("long").as("size"): _*)
    val w = Window.partitionBy(partCols.map(col): _*).orderBy("file")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = f.filter(col("size") < targetBytes)
      .withColumn("__cum", coalesce(sum(col("size")).over(w), lit(0L)))
      .select(partCols.map(col) :+ col("file") :+ col("size") :+
        lit("rewrite").as("action") :+
        expr(s"__cum div CAST($targetBytes AS BIGINT)").as("bin"): _*)
    val kept = f.filter(col("size") >= targetBytes)
      .select(partCols.map(col) :+ col("file") :+ col("size") :+
        lit("keep").as("action") :+ lit(null).cast("long").as("bin"): _*)
    packed.unionByName(kept)
  }

  /** Morton (z-order) key: interleaves the low `bits` bits of each
    * dimension, first column occupying the even bit positions of the
    * lowest group. Pure integer shift/mask expression tree — codegen'd,
    * exactly reproducible in any engine. Callers bucket the dimensions
    * into [0, 2^bits) first (e.g. `pmod`, quantiles, epoch-day mod).
    *
    * dims.size · bits must stay ≤ 62 (positive Long).
    */
  def zOrderKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits > 0 && dims.size * bits <= 62,
      s"${dims.size} dims x $bits bits must be in (0, 62]")
    val terms = for {
      (d, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(d, i) % 2, i * dims.size + j)
    terms.reduce(_ + _)
  }

  /** Grid-blocked proximity self-join: all point pairs within Chebyshev
    * distance ≤ `radius`, found by hashing points into radius-sized grid
    * cells and joining each point's 3×3 cell neighborhood against home
    * cells — O(n·density) candidates instead of the O(n²) cross join,
    * the standard spatial-blocking shape (same bounding idea as LSH
    * bands). Each unordered pair appears EXACTLY once: a point's home
    * cell is unique, so (a,b) matches only via b's home cell, and
    * `id_a < id_b` keeps one orientation — no distinct pass needed.
    *
    * Coordinates must be NON-NEGATIVE: cell assignment uses integer
    * `div`, which truncates toward zero, so negative coordinates would
    * straddle cell 0 and miss boundary pairs — shift into [0, ∞) first.
    * Output: (id_a, id_b, cheb).
    */
  def gridNeighborPairs(df: DataFrame, idCol: String, xCol: Column,
      yCol: Column, radius: Int): DataFrame = {
    require(radius > 0, s"radius=$radius must be positive")
    val pts = df.select(col(idCol).as("id"), xCol.as("x"), yCol.as("y"))
      .withColumn("cx", expr(s"x div $radius"))
      .withColumn("cy", expr(s"y div $radius"))
    val offsets = for { i <- -1 to 1; j <- -1 to 1 } yield (i, j)
    val probe = pts.select(col("id"), col("x"), col("y"),
      explode(array(offsets.map { case (i, j) =>
        struct((col("cx") + i).as("cx"), (col("cy") + j).as("cy"))
      }: _*)).as("nc"))
      .select(col("id"), col("x"), col("y"),
        col("nc.cx").as("cx"), col("nc.cy").as("cy"))
    probe.as("a").join(pts.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
          col("a.id") < col("b.id"))
      .filter(abs(col("a.x") - col("b.x")) <= radius &&
        abs(col("a.y") - col("b.y")) <= radius)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        greatest(abs(col("a.x") - col("b.x")),
          abs(col("a.y") - col("b.y"))).as("cheb"))
  }

  /** Repartition-and-sort by z-order key: rows land in files whose
    * min/max ranges are tight on every dimension simultaneously. This is
    * the write-side operator; [[zOrderKey]] alone serves when the caller
    * manages partitioning.
    */
  def clusterByZOrder(df: DataFrame, dims: Seq[Column], bits: Int,
      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("_z", zOrderKey(dims, bits))
    keyed.repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Data-skipping effectiveness audit — "does this layout actually
    * prune": given a file assignment and a probe-key workload, how many
    * files a point query on the key must touch under min/max zone-map
    * pruning (the Parquet row-group / Delta file-stats mechanism). A
    * range-clustered layout touches ~1 file per probe; a layout
    * uncorrelated with the key touches ~all of them — THE number that
    * justifies a [[clusterByZOrder]] rewrite before anyone runs it.
    *
    * One aggregate to the per-file (min, max) zone map (bounded by the
    * file count), then probes × broadcast zone map with the
    * containment filter — fan-out is the true files-touched count, the
    * quantity being measured. Exact integers.
    *
    * Output: one row (layout, n_files, n_probes, files_touched,
    * touch_ppm) with touch_ppm = 10⁶·touched div (files·probes) — 10⁶
    * means every probe scans every file, 10⁶/n_files is perfect
    * single-file routing.
    */
  def skippingAudit(df: DataFrame, fileCol: Column, keyCol: Column,
      probes: DataFrame, probeCol: Column, layout: String): DataFrame =
    skippingAuditFromZones(zoneMap(df, fileCol, keyCol), probes,
      probeCol, layout)

  /** The per-file (min, max) zone map — one aggregate, bounded by the
    * file count.
    */
  def zoneMap(df: DataFrame, fileCol: Column, keyCol: Column): DataFrame =
    df.select(fileCol.as("f"), keyCol.as("k"))
      .groupBy("f").agg(min("k").as("mn"), max("k").as("mx"))

  /** [[skippingAudit]]'s probe half over a prebuilt zone map — the
    * form a PERSISTED [[zoneStore]] feeds, so repeated workload audits
    * never rescan the table.
    */
  def skippingAuditFromZones(zones: DataFrame, probes: DataFrame,
      probeCol: Column, layout: String): DataFrame = {
    val p = probes.select(probeCol.as("p"))
    val nf = zones.agg(count(lit(1)).as("n_files"))
    val np = p.agg(count(lit(1)).as("n_probes"))
    p.join(broadcast(zones),
        col("p") >= col("mn") && col("p") <= col("mx"))
      .agg(count(lit(1)).as("files_touched"))
      .crossJoin(broadcast(nf)).crossJoin(broadcast(np))
      .select(lit(layout).as("layout"), col("n_files"), col("n_probes"),
        col("files_touched"),
        expr("""case when n_files * n_probes = 0 then cast(0 as bigint)
          |  else cast((files_touched * 1000000)
          |    div (n_files * n_probes) as bigint) end""".stripMargin)
          .as("touch_ppm"))
  }

  /** Persisted zone-map store — the [[graft.operators.ContentGate]]-
    * fingerprinted member of the store family (SigStore / LmStore /
    * CmsStore / SketchStore) for DATA LAYOUT: the per-file (min, max)
    * map is built once per (layout, corpus) fingerprint and every
    * subsequent workload audit reads the bounded parquet instead of
    * rescanning the table — the zone-map half of what a lakehouse
    * manifest caches. Same crash-safety contract as the other stores:
    * the stale fingerprint is deleted before a rebuild, so a crash can
    * only cost an extra build, never serve a stale map as fresh.
    */
  def zoneStore(df: DataFrame, fileCol: Column, keyCol: Column,
      dir: String, tag: String): DataFrame = {
    ContentGate.ensure(dir, tag) {
      zoneMap(df, fileCol, keyCol)
        .write.mode("overwrite").parquet(s"$dir/zones")
    }
    df.sparkSession.read.parquet(s"$dir/zones")
  }
}
