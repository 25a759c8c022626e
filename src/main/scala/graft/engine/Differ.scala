package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff: classify rows of `prod` vs `backup` into
  * INSERT / UPDATE / DELETE by primary key — the distributed equivalent of
  * the reference's per-table dict diff (/root/reference/sync.py:255-291).
  *
  * Implementation: one full-outer equi-join on the PK columns plus a
  * null-safe struct comparison (`<=>`) over the value columns — Spark's
  * `<=>` reproduces the reference's string-equality-with-NULL==NULL
  * semantics (sync.py:217-226) when columns are strings, and generalizes
  * to typed columns in native mode.
  *
  * Scale: the join shuffles both sides by PK (sort-merge under AQE); no
  * driver-side state. Skewed PKs are handled by AQE skew-join splitting.
  * If one snapshot is known-small, callers can pass it broadcast()-ed.
  */
object Differ {

  val OP_INSERT = "INSERT"
  val OP_UPDATE = "UPDATE"
  val OP_DELETE = "DELETE"

  /** Prefixes for the two sides' value columns in the diff output. */
  val ProdPrefix = "prod_"
  val BackupPrefix = "backup_"

  /** Full diff frame: pk columns, `op`, and both sides' value columns
    * (`prod_*` from production, `backup_*` from backup). Unchanged rows
    * are dropped. PKs are assumed non-null (the reference derives them
    * from parsed values and never produces SQL NULL keys).
    */
  def diff(prod: DataFrame, backup: DataFrame, pkCols: Seq[String]): DataFrame = {
    val valueCols = prod.columns.filterNot(pkCols.contains).toSeq
    val p = prod.select(
      pkCols.map(col) ++ Seq(lit(true).as("_p_present")) ++
        valueCols.map(c => col(c).as(ProdPrefix + c)): _*)
    val b = backup.select(
      pkCols.map(col) ++ Seq(lit(true).as("_b_present")) ++
        valueCols.map(c => col(c).as(BackupPrefix + c)): _*)
    val joined = p.join(b, pkCols, "full_outer")
    val rowsDiffer: Column =
      if (valueCols.isEmpty) lit(false)
      else !(struct(valueCols.map(c => col(ProdPrefix + c)): _*) <=>
             struct(valueCols.map(c => col(BackupPrefix + c)): _*))
    joined
      .withColumn("op",
        when(col("_b_present").isNull, OP_INSERT)
          .when(col("_p_present").isNull, OP_DELETE)
          .when(rowsDiffer, OP_UPDATE))
      .filter(col("op").isNotNull)
      .drop("_p_present", "_b_present")
  }

  /** Compact diff: pk columns + op only. */
  def diffOps(prod: DataFrame, backup: DataFrame, pkCols: Seq[String]): DataFrame =
    diff(prod, backup, pkCols).select((pkCols :+ "op").map(col): _*)

  /** Per-op counts — the reference's global stats (sync.py:402-423). */
  def stats(diffDf: DataFrame): DataFrame =
    diffDf.groupBy("op").agg(count(lit(1)).as("n"))

  /** MERGE-style distributed apply: transform `backup` into the
    * production state using a [[diff]] frame — the set-wise alternative
    * to generating and replaying a SQL script (what `MERGE INTO` does on
    * engines that have it). DELETE keys are anti-joined out, UPDATE and
    * INSERT rows come in with their production values. One shuffle on the
    * PK; no driver state.
    */
  def mergeApply(backup: DataFrame, diffDf: DataFrame,
      pkCols: Seq[String]): DataFrame = {
    val valueCols = backup.columns.filterNot(pkCols.contains).toSeq
    val touched = diffDf.select(pkCols.map(col): _*)
    val kept = backup.join(touched, pkCols, "left_anti")
    val upserts = diffDf.filter(col("op") =!= OP_DELETE)
      .select(pkCols.map(col) ++
        valueCols.map(c => col(ProdPrefix + c).as(c)): _*)
    kept.unionByName(upserts)
  }

  /** Catalog diff on table-name sets — CREATE/DROP planning
    * (sync.py:245-253). Inputs are single-column `table` frames.
    */
  def catalogDiff(prodTables: DataFrame, backupTables: DataFrame): DataFrame = {
    val missing = prodTables.join(backupTables, Seq("table"), "left_anti")
      .withColumn("op", lit("CREATE"))
    val extra = backupTables.join(prodTables, Seq("table"), "left_anti")
      .withColumn("op", lit("DROP"))
    missing.unionByName(extra)
  }
}
