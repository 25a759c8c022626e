package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * (BM25) with an embedding ranking is the standard recipe for RAG
  * retrieval stacks, and reciprocal-rank fusion (Cormack et al. 2009)
  * is the parameter-free way to do it: each list contributes
  * `1/(k + rank)`, summed per candidate.
  *
  * Scale design: fusion operates on the BOUNDED top-N candidate lists
  * the upstream scorers already produce (never on full-corpus
  * rankings), so the union is ≤ Σ N rows; one grouped sum on id
  * finishes it. Contributions are exact integer micros
  * (`1000000 div (k + rank)`), so the fused score is order-free and
  * bit-replayable by any engine.
  */
object Fusion {

  /** Fuse 1-based (id, rank) candidate lists. A document missing from a
    * list simply contributes nothing — the RRF convention.
    * Output: (id, n_lists, rrf_micro).
    */
  def rrf(rankings: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 0, s"k=$k")
    rankings.map(_.select(col("id"), col("rank")))
      .reduce(_ unionByName _)
      .groupBy("id")
      .agg(count(lit(1)).as("n_lists"),
        sum(expr(s"1000000 div ($k + rank)")).as("rrf_micro"))
  }
}
