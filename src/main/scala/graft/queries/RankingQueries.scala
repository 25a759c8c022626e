package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Relevance-ranking operators for training-data curation: BM25 scoring
  * of a document corpus against a query term set — the standard lexical
  * retrieval/quality-filter primitive (select the most on-topic documents
  * for a domain mix, rank near-duplicate clusters by topical relevance).
  *
  * Determinism design (the whole reason this is oracle-checkable):
  *  - tf / df / dl / N / Σdl are exact integers (count/sum of counts);
  *  - idf is the RATIONAL form (2N − 2df + 1)/(2df + 1) — the classic
  *    BM25 idf (N − df + 0.5)/(df + 0.5) with both sides doubled to stay
  *    integer — evaluated as one double division. No ln(): transcendental
  *    functions are the one place engines legitimately differ in the last
  *    ulp; a ratio of exact integers is a single correctly-rounded IEEE
  *    op, bit-identical everywhere.
  *  - per-term scores combine with a FIXED-order sum of per-term
  *    conditional aggregates (each aggregating ≤1 row per doc), never a
  *    float SUM whose grouping order the engine chooses;
  *  - every fractional literal in the oracle is CAST(... AS DOUBLE):
  *    DuckDB parses `2.2` as DECIMAL(2,1), so `tf * 2.2` would be EXACT
  *    decimal arithmetic where Spark's `lit(2.2)` rounds to double —
  *    a 1-ulp divergence on ~20% of rows.
  *
  * Scale: explode → two hash aggs (tf, dl) → broadcast of the O(1) corpus
  * stats and O(|terms|) df frame → map-side scoring. The only shuffles
  * are on doc_id/term — no all-pairs, no driver state.
  */
object RankingQueries {

  private type Q = (SparkSession, String) => DataFrame

  /** Fixed query-term set (lowercase, matching the tokenizer). */
  val QueryTerms: Seq[String] = Seq("data", "learning", "model")

  // BM25 constants: k1 = 1.2, b = 0.75 (so k1+1 = 2.2, 1−b = 0.25).

  // ---------------------------------------------------------------- q58
  val q58: Q = (s, dir) => {
    val docs = graft.operators.Spread.ensure(Tables.documents(s, dir), "doc_id")
    val toks = docs.select(col("doc_id"),
      explode(Portable.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val st = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val qtf = tf.filter(col("term").isInCollection(QueryTerms))
    val dft = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val sc = qtf
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .join(broadcast(dft), "term")
      // (2N−2df+1)/(2df+1): exact ints, one double division
      .withColumn("idf",
        (lit(2) * col("n") - lit(2) * col("df") + lit(1)).cast("double") /
          (lit(2) * col("df") + lit(1)).cast("double"))
      // dl/avgdl = dl·N / Σdl: exact integer products, one division
      .withColumn("ratio",
        (col("dl") * col("n")).cast("double") / col("sumdl").cast("double"))
      // idf · tf(k1+1) / (tf + k1(1−b + b·ratio)) — parenthesization
      // mirrored token-for-token in q58Sql
      .withColumn("s",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("ratio"))))
    // fixed-order combination: one conditional agg per term (≤1 row each,
    // so no float-sum ordering), then a left-to-right addition
    val perTerm = QueryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("s"))).as(s"s$i")
    }
    sc.groupBy("doc_id").agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"),
        QueryTerms.indices
          .map(i => coalesce(col(s"s$i"), lit(0.0)))
          .reduceLeft(_ + _).as("bm25"))
      .orderBy("doc_id")
  }

  val q58Sql: String = {
    val inList = QueryTerms.map(t => s"'$t'").mkString(", ")
    val fixedSum = QueryTerms
      .map(t => s"coalesce(sum(CASE WHEN term = '$t' THEN s END), 0.0)")
      .mkString("\n  + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |st AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
       |dft AS (SELECT term, count(*) AS df FROM tf
       |        WHERE term IN ($inList) GROUP BY term),
       |sc AS (
       |  SELECT tf.doc_id, tf.term,
       |    (CAST(2*st.n - 2*dft.df + 1 AS DOUBLE) / CAST(2*dft.df + 1 AS DOUBLE))
       |      * (tf.tf * CAST(2.2 AS DOUBLE))
       |      / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
       |          + CAST(0.75 AS DOUBLE) *
       |          (CAST(dl.dl * st.n AS DOUBLE) / CAST(st.sumdl AS DOUBLE)))) AS s
       |  FROM tf
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN st
       |  JOIN dft ON tf.term = dft.term)
       |SELECT doc_id,
       |  $fixedSum AS bm25
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map("q58_bm25" -> q58)
  val oracle: Map[String, String] = Map("q58_bm25" -> q58Sql)
}
