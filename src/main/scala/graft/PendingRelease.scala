package graft

/** Deferred-release registry for operator-internal persists.
  *
  * `SparkEntry.queries` functions return a bare `DataFrame`, so a query
  * built on a managed operator (e.g. [[graft.operators.Graph.hitsManaged]],
  * whose per-round caches the RESULT plan still reads from) has no channel
  * to hand its cleanup handle to the caller. Releasing inside the query
  * function is wrong in both directions: releasing before returning forces
  * an eager persist+count round-trip on every invocation (the round-11
  * q205 regression, 2.92 → 6.34 s warm), and not releasing leaks the
  * caches past the materialization (the round-10 q205 leak).
  *
  * Contract: a query that persists internals its result depends on calls
  * [[defer]] with the release handle; every harness that materializes a
  * query (Bench, ScaleBench, Verify, specs) calls [[drain]] AFTER the
  * materialization. Handles registered between drains are released in
  * registration order; a handle that throws a NON-fatal error is logged
  * and skipped so one bad release can't strand the rest (fatal errors —
  * OutOfMemoryError, interruption — propagate: masking those hides real
  * harness failure). Draining with nothing pending is free, so harnesses
  * drain unconditionally after every entry.
  *
  * EMBEDDERS: a long-lived host that materializes engine frames itself
  * (a service wrapping [[graft.SparkEntry.queries]], a JDBC host) must
  * call [[drain]] after each materialization, or any deferred cache
  * accumulates for the life of the JVM. The engine's own streaming
  * drivers ([[graft.streaming.DumpWatchSync.start]],
  * [[graft.streaming.StreamingDedup.start]]) drain at the end of every
  * micro-batch — each batch's outputs are committed by then, so the
  * batch IS the materialization — and a spec pins the registry at
  * baseline after each batch (PendingReleaseSpec).
  */
object PendingRelease {
  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Register a cleanup to run at the harness's next [[drain]]. */
  def defer(release: () => Unit): Unit = { pending.add(release); () }

  /** Handles currently awaiting [[drain]] — the leak observable the
    * per-batch drain specs assert returns to zero.
    */
  def pendingCount: Int = pending.size

  /** Run and clear all pending releases (registration order). */
  def drain(): Unit = {
    var f = pending.poll()
    while (f != null) {
      try f() catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[graft] deferred release failed (skipped): $e")
      }
      f = pending.poll()
    }
  }
}
