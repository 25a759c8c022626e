package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: keys that co-locate multi-dimensionally close
  * rows so file-level min/max statistics prune on EVERY clustered
  * dimension — at 100 TB the difference between scanning terabytes and
  * scanning megabytes for a 2-predicate query is whether the layout was
  * clustered on both columns (the z-order optimization of Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, expressed engine-side).
  */
object Layout {

  /** Morton (z-order) key: interleaves the low `bits` bits of each
    * dimension, first column occupying the even bit positions of the
    * lowest group. Pure integer shift/mask expression tree — codegen'd,
    * exactly reproducible in any engine. Callers bucket the dimensions
    * into [0, 2^bits) first (e.g. `pmod`, quantiles, epoch-day mod).
    *
    * dims.size · bits must stay ≤ 62 (positive Long).
    */
  def zOrderKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits > 0 && dims.size * bits <= 62,
      s"${dims.size} dims x $bits bits must be in (0, 62]")
    val terms = for {
      (d, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(d, i) % 2, i * dims.size + j)
    terms.reduce(_ + _)
  }

  /** Repartition-and-sort by z-order key: rows land in files whose
    * min/max ranges are tight on every dimension simultaneously. This is
    * the write-side operator; [[zOrderKey]] alone serves when the caller
    * manages partitioning.
    */
  def clusterByZOrder(df: DataFrame, dims: Seq[Column], bits: Int,
      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("_z", zOrderKey(dims, bits))
    keyed.repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
