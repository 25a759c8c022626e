package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FULLY DISTRIBUTED Lloyd k-means over an embedding column — the
  * complement of [[Similarity.kmeansCentroids]], which trains on a
  * bounded driver-side sample (the FAISS-style IVF coarse-quantizer
  * pattern). Here the UPDATE step is distributed too: when the corpus is
  * 100 TB no training sample that fits on the driver represents the tail,
  * and clustering the full base is the point (SemDeDup cells, corpus
  * cartography, balanced shard assignment).
  *
  * Per iteration:
  *  - ASSIGN is map-only: the k centroids broadcast as literal arrays,
  *    each row computes k exact-Long squared distances inside codegen
  *    (`zip_with`/`aggregate`), argmin with lowest-cluster tiebreak;
  *  - UPDATE is ONE shuffle: `posexplode` to (cluster, dim, x), a single
  *    partial-aggregated sum/count per (cluster, dim), and a k·dims-row
  *    collect back to the driver (k=16, dims=64 → 1024 rows — the same
  *    justified-collect class as the IVF codebooks).
  *
  * Determinism contract (what lets the DuckDB oracle replay it bit-for-
  * bit): vectors are integer-quantized up front (`floor(x·scale + 0.5)`),
  * distances and sums are exact Long arithmetic (order-independent),
  * centroid means are `floor(sum/count)` in IEEE double (both engines
  * compute the identical double), empty clusters keep their previous
  * centroid, init = the k lowest-id vectors. No RNG anywhere.
  */
object Cluster {

  private def quantize(vecCol: String, scale: Int): Column =
    expr(s"transform($vecCol, x -> " +
      s"CAST(floor(CAST(x AS DOUBLE) * ${scale}.0d + 0.5d) AS BIGINT))")

  /** Squared-euclid argmin assignment against literal centroids (in
    * cluster-id order): adds `cluster` and exact `dist` columns.
    */
  private def assign(q: DataFrame, cents: Seq[Seq[Long]]): DataFrame = {
    val ds = array(cents.map { c =>
      aggregate(
        zip_with(col("v"), typedlit(c), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
    }: _*)
    q.withColumn("ds", ds)
      .withColumn("dist", array_min(col("ds")))
      .withColumn("cluster", (array_position(col("ds"), col("dist")) - 1).cast("int"))
      .drop("ds")
  }

  /** Cluster every row of `df`: returns (id, cluster, dist) with `dist`
    * the exact quantized squared distance to the winning centroid.
    */
  def kmeansLloyd(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Int = 1000): DataFrame = {
    require(k > 0 && iters >= 0)
    val q = df.select(col(idCol).as("id"), quantize(vecCol, scale).as("v"))
    // init: the k lowest-id vectors (k rows to the driver — justified)
    var cents: Seq[Seq[Long]] = q.orderBy("id").limit(k)
      .select("v").collect().map(_.getSeq[Long](0)).toSeq
    require(cents.length == k, s"need at least $k rows to seed $k clusters")
    for (_ <- 0 until iters) {
      val upd = assign(q, cents)
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .withColumn("m", expr("CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)"))
        .select("cluster", "dim", "m")
        .collect() // k·dims rows — justified
      val byCluster: Map[Int, Seq[Long]] = upd
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
        }
      cents = cents.zipWithIndex.map { case (old, c) =>
        byCluster.getOrElse(c, old) // empty cluster keeps its centroid
      }
    }
    assign(q, cents).select(col("id"), col("cluster"), col("dist"))
  }
}
