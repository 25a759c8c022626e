package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental sync: the sync core's diff semantics re-expressed
  * over an unbounded change stream instead of two snapshots.
  *
  * The batch engine classifies ops by joining two full snapshots
  * (engine.SyncJob); here each incoming record is compared against the
  * per-key state held by Spark's state store, and a net INSERT / UPDATE /
  * DELETE op is emitted only when the record actually changes the target —
  * the same classification rules as the batch differ (values equal ⇒ no
  * op; NULL-token equality included, since values are the reference's raw
  * literal strings).
  *
  * Scale: state is partitioned by (table, pk) across executors — the
  * streaming analogue of the batch full-outer join's shuffle — and lives
  * in the state store (RocksDB-backed in production), not the driver.
  */
object StreamingSync {

  /** One upstream change record (e.g. parsed from dump statements or a
    * CDC feed). `ts` orders records within a micro-batch; `deleted`
    * marks tombstones.
    */
  final case class CdcRecord(
      table: String,
      pk: String,
      ts: Long,
      deleted: Boolean,
      vals: Seq[String])

  /** A net sync operation to apply downstream. */
  final case class OpEvent(table: String, pk: String, op: String, vals: Seq[String])

  /** Per-key state: the values currently applied to the target. */
  final case class KeyState(vals: Seq[String])

  /** Classify a change stream into net ops with flatMapGroupsWithState.
    * Works on batch Datasets too (Spark runs the same function per group
    * with empty initial state).
    */
  def incrementalOps(cdc: Dataset[CdcRecord])(
      implicit spark: SparkSession): Dataset[OpEvent] = {
    import spark.implicits._
    cdc.groupByKey(r => (r.table, r.pk))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), rows: Iterator[CdcRecord], state: GroupState[KeyState]) =>
          val (table, pk) = key
          val out = Seq.newBuilder[OpEvent]
          var cur: Option[Seq[String]] = state.getOption.map(_.vals)
          rows.toSeq.sortBy(_.ts).foreach { r =>
            if (r.deleted) {
              if (cur.isDefined) { out += OpEvent(table, pk, "DELETE", Nil); cur = None }
            } else cur match {
              case None => out += OpEvent(table, pk, "INSERT", r.vals); cur = Some(r.vals)
              case Some(v) if v != r.vals =>
                out += OpEvent(table, pk, "UPDATE", r.vals); cur = Some(r.vals)
              case _ => // unchanged ⇒ no op (batch differ parity)
            }
          }
          cur match {
            case Some(v) => state.update(KeyState(v))
            case None => state.remove()
          }
          out.result().iterator
      }
  }
}
