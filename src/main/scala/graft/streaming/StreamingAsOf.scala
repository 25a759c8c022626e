package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — [[graft.operators.AsOf]]'s nearest-predecessor
  * semantics over unbounded streams: every probe (left) row is matched to
  * the newest reference (right) row with the same key and `ts ≤` the
  * probe's, emitting only once the event-time watermark guarantees no
  * earlier-timestamped reference row can still arrive. Out-of-order
  * arrival within the watermark therefore CANNOT change results — the
  * stream output equals the batch `joinAsOf` on the same rows (proven in
  * StreamingAsOfSpec).
  *
  * Mechanics: both sides union-tag into one keyed stream (the streaming
  * analogue of the batch operator's union + window), and per-key state
  * buffers rows still inside the watermark. On every trigger (and on
  * event-time timeout, so quiet keys still drain):
  *  - probes with `ts ≤ watermark` emit, matched against the buffered
  *    references by binary search over the sorted (ts, value) buffer —
  *    right-before-left at equal ts, ties among references broken by the
  *    greatest (ts, value) (the batch operator's deterministic rule);
  *  - references older than the watermark are pruned EXCEPT the newest
  *    one at-or-below it, which future probes (all `> watermark`) may
  *    still match — state is O(rows inside one watermark) per key, the
  *    shape that holds on an unbounded stream.
  *
  * Scale: state is hash-partitioned by key across executors in the state
  * store (RocksDB-backed in production), exactly like the batch
  * operator's single exchange; nothing accumulates on the driver.
  */
object StreamingAsOf {

  /** Reference-side row (e.g. a quote): the value carried onto probes. */
  final case class RefRow(key: String, ts: Timestamp, value: String)

  /** Probe-side row (e.g. a trade) asking "newest value as of my ts". */
  final case class ProbeRow(key: String, ts: Timestamp, id: Long)

  /** One matched probe; `refTs`/`refValue` are None when no reference
    * row precedes the probe (left-outer semantics, like the batch op).
    */
  final case class AsOfMatch(key: String, id: Long, ts: Timestamp,
      refTs: Option[Timestamp], refValue: Option[String])

  /** Internal union-tag row (public: Spark's codegen'd encoders cannot
    * access private classes).
    */
  final case class In(key: String, ts: Timestamp, side: Int,
      id: Long, value: String)

  /** Internal per-key buffers in event-time ms, sorted ascending on
    * merge (public for the same encoder reason).
    */
  final case class Buf(refs: Seq[(Long, String)],
      probes: Seq[(Long, Long)])

  /** Join a probe stream to a reference stream as-of event time.
    *
    * @param delay max expected out-of-orderness (the watermark delay on
    *              BOTH sides); rows later than this are dropped by the
    *              engine, same as any watermarked streaming op
    */
  def asOfStream(probes: Dataset[ProbeRow], refs: Dataset[RefRow],
      delay: String)(implicit spark: SparkSession): Dataset[AsOfMatch] = {
    import spark.implicits._
    val p = probes.map(r => In(r.key, r.ts, 1, r.id, null))
    val r = refs.map(r => In(r.key, r.ts, 0, 0L, r.value))
    // watermark AFTER the map+union: Dataset.map re-derives the schema,
    // so an upstream event-time tag would not survive to the stateful op
    p.unionByName(r)
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[In], state: GroupState[Buf]) =>
          val prev = state.getOption.getOrElse(Buf(Nil, Nil))
          val incoming = rows.toSeq
          val refs = (prev.refs ++ incoming.filter(_.side == 0)
            .map(i => (i.ts.getTime, i.value))).sorted
          val probes = (prev.probes ++ incoming.filter(_.side == 1)
            .map(i => (i.ts.getTime, i.id))).sorted
          val wm = state.getCurrentWatermarkMs()
          val (ripe, pending) = probes.partition(_._1 <= wm)
          val out = ripe.map { case (ts, id) =>
            // newest ref with refTs <= ts; ties by greatest (ts, value)
            val m = refs.takeWhile(_._1 <= ts).lastOption
            AsOfMatch(key, id, new Timestamp(ts),
              m.map(x => new Timestamp(x._1)), m.map(_._2))
          }
          // keep refs inside the watermark plus the newest one at/below
          // it (the only pruned-range ref a future probe can match)
          val (old, live) = refs.partition(_._1 <= wm)
          val kept = old.lastOption.toSeq ++ live
          if (kept.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(Buf(kept, pending))
            // wake this key when the watermark passes its oldest pending
            // probe even if no new rows arrive
            val next = (pending.map(_._1) ++ live.map(_._1)).minOption
            next.foreach(t => state.setTimeoutTimestamp(math.max(t, wm + 1)))
          }
          out.iterator
      }
  }
}
