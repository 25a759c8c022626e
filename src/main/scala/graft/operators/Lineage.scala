package graft.operators

import org.apache.spark.sql.DataFrame

/** Tracked eager localCheckpoints for iterative operators.
  *
  * Iterative join/aggregate operators (PageRank, label-propagation
  * components) must cut lineage every round — self-referencing plans
  * otherwise re-analyze exponentially — but `Dataset.localCheckpoint`
  * returns no handle to the RDD it materializes, and
  * `spark.catalog.clearCache()` does NOT free RDD-level checkpoint
  * blocks. Checkpointing N rounds therefore parks O(rows × N) blocks in
  * the BlockManager until LRU eviction: monotonic storage-memory growth
  * on any long-running session — the genuine scale-killer at 100 TB.
  *
  * [[checkpointTracked]] diffs the context's persistent-RDD registry
  * around the checkpoint call, so the caller gets a release thunk that
  * unpersists exactly the blocks that checkpoint created. Iterative
  * operators release round N−1 as soon as round N has materialized (the
  * newer checkpoint no longer references the older one), keeping live
  * checkpoint storage at O(rows), not O(rows × rounds).
  */
object Lineage {

  /** Eagerly localCheckpoint `df`; returns the checkpointed frame plus a
    * release thunk that unpersists the checkpoint's storage blocks.
    *
    * The registry diff assumes no concurrent persist call lands between
    * the two registry reads (operator-internal iteration is
    * single-threaded). A localCheckpoint TRUNCATES lineage: after
    * release() the frame cannot be recomputed, so release a round only
    * once every downstream consumer has either materialized its own
    * checkpoint or finished its action.
    */
  def checkpointTracked(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint(true)
    val added = (sc.getPersistentRDDs.keySet -- before).toSeq
    val release = () => {
      val reg = sc.getPersistentRDDs
      added.foreach(id => reg.get(id).foreach(_.unpersist(false)))
    }
    (cp, release)
  }
}
