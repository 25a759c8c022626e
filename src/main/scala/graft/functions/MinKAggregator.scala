package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV sketch summary: number of distinct hashes kept (≤ k) and the
  * largest kept hash (the k-th smallest distinct overall when full).
  */
final case class KmvSummary(n_kept: Long, kth: Long)

/** Bounded min-k-distinct aggregator: keeps the k smallest *distinct*
  * Long values seen. The buffer is a sorted array of length ≤ k, so
  * partial (map-side) aggregation ships at most k longs per group per
  * partition and no per-group global sort or pre-distinct shuffle is
  * needed — the scale-safe formulation of the KMV cardinality sketch
  * (contrast the window `row_number` form, which sorts ALL distinct
  * hashes of a group in one task).
  */
class MinKDistinctAggregator(k: Int)
    extends Aggregator[Long, Array[Long], KmvSummary] {

  // buffer invariant: sorted ascending, distinct, length ≤ k
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n == k && h >= buf(n - 1)) return buf // O(1) reject once full
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) return buf // already present
    val ins = -idx - 1
    val outLen = math.min(n + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    var prev = 0L; var prevSet = false
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) { val x = a(i); i += 1; x }
              else { val x = b(j); j += 1; x }
      if (!prevSet || v != prev) { out(o) = v; o += 1; prev = v; prevSet = true }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): KmvSummary =
    KmvSummary(buf.length.toLong, if (buf.isEmpty) 0L else buf(buf.length - 1))

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[KmvSummary] = Encoders.product[KmvSummary]
}

object MinKDistinctAggregator {
  /** Untyped Column form over a Long column: `minK(64)(hashCol)`. */
  def minK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new MinKDistinctAggregator(k), Encoders.scalaLong)

  /** Sketch-emitting form: returns the kept sorted min-k hash array
    * itself instead of the (n_kept, kth) summary — the mergeable
    * representation (store per-shard/per-day, merge later by re-running
    * min-k over the union of arrays; KMV min-k is associative).
    */
  def minKArray(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new MinKArrayAggregator(k), Encoders.scalaLong)
}

/** [[MinKDistinctAggregator]] with the raw buffer as output. */
class MinKArrayAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private val inner = new MinKDistinctAggregator(k)
  override def zero: Array[Long] = inner.zero
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    inner.reduce(buf, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    inner.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
