package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Portable cardinality sketches.
  *
  * KMV (k-minimum-values): keep the k smallest distinct 48-bit hashes of
  * a column; if the k-th smallest is `kth`, the distinct count is
  * ≈ (k-1)·2⁴⁸/kth. Unlike HLL — whose register layout is
  * engine-specific, so `approx_count_distinct` can never hash-match
  * across engines — the KMV sketch over the md5-derived hash48 is fully
  * deterministic and any engine replays the identical estimate
  * (exactly checkable by the DuckDB oracle).
  *
  * Scale: the distinct() is one map-side-combining shuffle on
  * (group, hash); the per-group min-k runs on the already-distinct
  * hashes, partitioned by group. For very hot groups, pre-filter
  * `h < t` with a generous threshold t before the window — KMV only
  * ever looks at the smallest hashes.
  */
object Sketches {

  val HashSpace: Double = 281474976710656.0 // 2^48

  /** Per-group KMV distinct-count estimate of `valueCol` (hashed via its
    * canonical string form so any engine reproduces it). Groups with
    * fewer than k distinct values report the exact count.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      k: Int): DataFrame = {
    val hashed = df
      .select(groupCols.map(col) :+
        Portable.hash48(valueCol.cast("string")).as("h"): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("h")
    val est = when(col("n_kept") < k, col("n_kept").cast("double"))
      .otherwise(round(lit((k - 1) * HashSpace) / col("kth"), 2))
    hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max("h").as("kth"))
      .select(groupCols.map(col) :+ est.as("est_distinct"): _*)
  }
}
