package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality rule validation — the pre-ingest gate a 100 TB pipeline
  * runs BEFORE trusting a new snapshot (reference scope: the sync
  * engine's "did the backup actually match production" question,
  * generalized to arbitrary row predicates and cross-table integrity).
  *
  * Design for scale: all row-level rules evaluate in ONE pass — a single
  * aggregate carrying one codegen'd conditional count per rule — so N
  * rules cost one scan, not N. Referential-integrity rules are left
  * anti-joins on the key (the orphan count); each adds one join but
  * streams the fact side once. Output is one row per rule:
  * (rule, n_rows, n_violations, violation_frac).
  */
object Quality {

  /** Evaluate row-level predicate rules in one scan. Each rule is
    * (name, predicate-that-GOOD-rows-satisfy); a null predicate result
    * counts as a violation (null-hostile by design — an unexpected null
    * IS a quality defect unless the rule says otherwise).
    */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, pred) =>
        coalesce(sum(when(!coalesce(pred, lit(false)), 1L)), lit(0L))
          .as(s"v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map { case (name, _) =>
      one.select(lit(name).as("rule"), col("n_rows"),
        col(s"v_$name").as("n_violations"))
    }
    rows.reduce(_ unionByName _)
      .withColumn("violation_frac",
        col("n_violations").cast("double") / col("n_rows"))
  }

  /** Referential-integrity rule: count fact rows whose `factKey` has no
    * match in `dim`'s `dimKey` (orphans). One left anti-join; the dim
    * side ships its key column only.
    */
  def checkReferential(name: String, fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column): DataFrame = {
    val total = fact.agg(count(lit(1)).as("n_rows"))
    val orphans = fact.select(factKey.as("k"))
      .join(dim.select(dimKey.as("k")), Seq("k"), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_violations"))
    total.crossJoin(orphans)
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations").cast("double") / col("n_rows"))
          .as("violation_frac"))
  }
}
