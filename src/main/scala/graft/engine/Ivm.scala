package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for group-by aggregates — the sync
  * engine's answer to "keep the dashboard in sync too". The reference
  * recomputes everything per run (sync.py rebuilds both in-memory
  * databases from scratch); at 100 TB a maintained SUM/COUNT view must
  * instead be advanced by the row-level delta the diff already found:
  * re-aggregation costs a full scan, maintenance costs O(changed rows).
  *
  * Delta propagation is the classic multiset-algebra form: every changed
  * row contributes (−1, −v) at its OLD group and (+1, +v) at its NEW
  * group (so group-migrating updates move mass between groups), the old
  * aggregate state contributes itself, and ONE union + ONE hash
  * aggregate folds them. No join against the maintained view, no
  * per-group state — the shape that survives any delta skew. Groups
  * whose count reaches zero are dropped (exact multiset semantics).
  *
  * Counts and sums must be exact (Long) for maintenance to be
  * indistinguishable from recompute — float sums would drift by
  * aggregation order. The correctness contract (maintained view ==
  * direct aggregate of the new table) is pinned by IvmSpec and by the
  * q91 oracle, which recomputes from the new table directly — an
  * INDEPENDENT path, not a replay of the maintenance arithmetic.
  */
object Ivm {

  /** Row-level delta contributions between `oldTable` and `newTable`,
    * keyed by `pkCols`: one (g, dn, dv) row per side of each changed
    * row. Unchanged rows (same group, same value, present in both) are
    * filtered out BEFORE the shuffle — the frame is O(changed), and the
    * full-outer diff join only carries the three maintained columns
    * (pk, group, value), i.e. a column-pruned scan of each side.
    */
  def aggDeltas(oldTable: DataFrame, newTable: DataFrame, pkCols: Seq[String],
      groupCol: Column, valueCol: Column): DataFrame = {
    def slim(df: DataFrame, tag: String) =
      df.select(pkCols.map(col) :+ groupCol.as(s"g_$tag") :+
        valueCol.cast("long").as(s"v_$tag") :+ lit(1).as(s"p_$tag"): _*)
    val joined = slim(oldTable, "old")
      .join(slim(newTable, "new"), pkCols, "full_outer")
      .filter(!(col("p_old").isNotNull && col("p_new").isNotNull &&
        col("g_old") <=> col("g_new") && col("v_old") <=> col("v_new")))
    val removed = joined.filter(col("p_old").isNotNull)
      .select(col("g_old").as("g"), lit(-1L).as("dn"), (-col("v_old")).as("dv"))
    val added = joined.filter(col("p_new").isNotNull)
      .select(col("g_new").as("g"), lit(1L).as("dn"), col("v_new").as("dv"))
    removed.unionByName(added)
  }

  /** Advance a maintained (count, sum) view by a delta frame from
    * [[aggDeltas]]. `oldAgg` has columns (g, n, s) — the stored view;
    * output has the same schema and equals the direct aggregate of the
    * new table exactly.
    */
  def maintainAgg(oldAgg: DataFrame, delta: DataFrame): DataFrame =
    oldAgg.select(col("g"), col("n").as("dn"), col("s").as("dv"))
      .unionByName(delta.select(col("g"), col("dn"), col("dv").as("dv")))
      .groupBy("g")
      .agg(sum(col("dn")).as("n"), sum(col("dv")).as("s"))
      .filter(col("n") > 0)

  /** Count-only maintenance: advance a (g, n) count view by a (g, dn)
    * delta — the per-table row-count statistics the dump watcher keeps
    * current per arrival without rescanning any snapshot
    * ([[graft.streaming.DumpWatchSync.processDump]] wires it in; the
    * spec checks maintained == recomputed at every arrival).
    */
  def maintainCounts(oldCounts: DataFrame, deltaN: DataFrame): DataFrame =
    oldCounts.select(col("g"), col("n").as("dn"))
      .unionByName(deltaN.select(col("g"), col("dn")))
      .groupBy("g").agg(sum(col("dn")).as("n"))
      .filter(col("n") > 0)

  /** End-to-end convenience: the maintained view of
    * groupBy(groupCol).agg(count, sum(valueCol)) after `oldTable` →
    * `newTable`, starting from the view state computed over `oldTable`.
    */
  def maintainedAgg(oldTable: DataFrame, newTable: DataFrame,
      pkCols: Seq[String], groupCol: Column, valueCol: Column): DataFrame = {
    val oldAgg = oldTable.groupBy(groupCol.as("g"))
      .agg(count(lit(1)).as("n"), sum(valueCol.cast("long")).as("s"))
    maintainAgg(oldAgg,
      aggDeltas(oldTable, newTable, pkCols, groupCol, valueCol))
  }
}
