package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (nearest-predecessor) join — the time-series primitive Spark has
  * no native operator for: for every left row, the single right row with
  * matching keys and the greatest ordering value ≤ the left row's
  * (classic uses: trade→latest quote, purchase→latest click, reading→
  * latest calibration).
  *
  * Implementation is ONE shuffle: both sides union-tagged into a single
  * frame, hash-partitioned by the keys and sorted by (ord, side), and a
  * running `last(right_payload, ignoreNulls)` window carries the newest
  * right row forward onto each left row. Right rows sort BEFORE left rows
  * at equal ord (inclusive ≤, matching DuckDB/kdb ASOF semantics); ties
  * among right rows break by the full right-row struct comparison, so the
  * result is deterministic under any partitioning.
  *
  * Scale: the naive formulation — range join `r.ord <= l.ord` + row_number
  * — explodes to O(|L|·|R|) pairs per key before pruning; this stays
  * O(|L|+|R|) rows through one exchange, the shape that survives 100 TB.
  */
object AsOf {

  /** Left-outer as-of join. `left` and `right` must both have the `keys`
    * and `ordCol` columns; every right column comes back nested under an
    * `asof` struct (null when no right row precedes the left row).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      ordCol: String): DataFrame = {
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)
    def side(df: DataFrame, isLeft: Boolean): DataFrame = {
      val tag = if (isLeft) lit(1) else lit(0)
      val allCols = df.columns.toIndexedSeq.map(col)
      val lPay = if (isLeft) struct(allCols: _*) else lit(null).cast(lStruct)
      val rPay = if (isLeft) lit(null).cast(rStruct) else struct(allCols: _*)
      df.select(keys.map(col) ++ Seq(col(ordCol).as("_ord"),
        tag.as("_side"), lPay.as("_l"), rPay.as("_r")): _*)
    }
    val unioned = side(left, isLeft = true)
      .unionByName(side(right, isLeft = false))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ord").asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*"), col("asof"))
  }
}
