package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog register aggregation as ONE typed aggregate: input is
  * the (bucket, rank) pair projected by
  * [[graft.operators.Sketches.hllPrep]], the buffer is the m-byte
  * register array (rank ≤ 42 for the 48-bit hash, so a byte per
  * register; 0 = never hit), merge is elementwise max.
  *
  * This replaces the m-conditional-`max`-columns formulation
  * (`hllRegCols`) in streaming plans: Structured Streaming re-runs the
  * optimizer on every micro-batch, and a 128-aggregate-column plan plus
  * a 128-term estimate expression costs seconds of planning PER BATCH
  * (measured 20.9 s warm for a 4-batch drive with 3 state rows — all
  * planner). One UDAF column plus one `aggregate()` fold is the same
  * integers with a constant-size plan.
  */
class HllRegsAggregator(m: Int)
    extends Aggregator[(Long, Long), Array[Byte], Seq[Int]] {
  require(m > 0 && m <= 1024, s"register count out of range: $m")

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], in: (Long, Long)): Array[Byte] = {
    val b = in._1.toInt
    val r = in._2.toByte
    if (r > buf(b)) buf(b) = r
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Seq[Int] = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  override def bufferEncoder: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Seq[Int]] =
    ExpressionEncoder[Seq[Int]]()
}
