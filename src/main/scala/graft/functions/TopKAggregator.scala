package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** (id, score) pair; scores are exact integer units (cents etc.). */
final case class ScoredId(id: Long, score: Long)

/** Typed top-k aggregator — the engine's user-defined-aggregate surface
  * (the reference has none; SURVEY.md §2.2). Keeps the k largest scores
  * with deterministic (score desc, id asc) tiebreak; the buffer is a
  * bounded sorted list, so partial (map-side) aggregation ships at most
  * k rows per group per partition — a top-k that never shuffles the full
  * group.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def best(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortBy(x => (-x.score, x.id)).take(k)

  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    best(buf :+ a)
  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    best(b1 ++ b2)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAggregator {
  /** Untyped Column form: `topK(3)(idCol, scoreCol)`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[ScoredId])
}
