package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join with NO equi key — the range-join shape Spark's
  * planner cannot execute scalably on its own: `p.ts BETWEEN i.start AND
  * i.end` with nothing to hash on plans as BroadcastNestedLoop (if one
  * side is small) or a cartesian product (if neither is), both O(|P|·|I|)
  * row comparisons. With millions of global incident windows over
  * billions of points, that plan never finishes.
  *
  * The scalable form is BUCKET EXPANSION (the technique behind interval
  * trees flattened onto a shuffle, cf. Spark's own stream-stream interval
  * join and published range-join rewrites in Photon/Databricks runtime
  * docs): pick a bucket width W on the point axis, send every point to
  * its one bucket `pt div W`, replicate every interval to each bucket it
  * overlaps (`start div W .. end div W`), equi-join on the bucket id, and
  * re-check the exact predicate. Each matching pair meets in EXACTLY one
  * bucket — the point's — so no dedup pass is needed. Cost: one shuffle
  * keyed on bucket, interval replication factor 1 + span/W. Pick W near
  * the median interval span: replication stays ~2× while each bucket
  * holds only co-located candidates.
  *
  * Domain: both columns must be non-negative longs (epoch micros here);
  * `div` keeps the arithmetic in exact integer space — no double
  * rounding at 1e15-scale timestamps. Bounds are inclusive on both ends
  * (SQL BETWEEN).
  */
object RangeJoin {

  /** All (point, interval) pairs with `pt` in `[start, end]`. Inputs must
    * not already carry a `_rj_b` column; output drops it. Column objects
    * must refer to the respective input frames by name so they survive
    * the bucket-column projection.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_rj_b", expr(s"$ptCol div ${bucketWidth}L"))
    val i = intervals.withColumn("_rj_b",
      explode(sequence(expr(s"$startCol div ${bucketWidth}L"),
        expr(s"$endCol div ${bucketWidth}L"))))
    p.join(i, Seq("_rj_b"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_rj_b")
  }

  /** All (a, b) interval pairs that OVERLAP (`aStart ≤ bEnd AND bStart ≤
    * aEnd`, inclusive — touching endpoints count), again with no equi
    * key. Both sides replicate to every bucket they span; a matching
    * pair co-occurs in every bucket of the overlap region, so the
    * exactly-once rule keeps the pair only in the FIRST shared bucket —
    * `max(aStart, bStart) div W`, the bucket where the later interval
    * begins. Column names on the two inputs must be disjoint.
    */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def spans(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_rj_b", explode(sequence(
        expr(s"$s div ${bucketWidth}L"), expr(s"$e div ${bucketWidth}L"))))
    spans(a, aStart, aEnd).join(spans(b, bStart, bEnd), Seq("_rj_b"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("_rj_b") ===
        expr(s"greatest($aStart, $bStart) div ${bucketWidth}L"))
      .drop("_rj_b")
  }
}
