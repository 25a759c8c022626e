package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Guard against single-task map stages: parquet written as one file with
  * one row group arrives as ONE scan partition no matter what
  * `maxPartitionBytes` says (a split below a row-group boundary reads
  * nothing), so every downstream per-row computation — tokenize, shingle,
  * hash, dot products — would serialize on one core until the first
  * shuffle. That is both the local-bench bottleneck under CPU contention
  * and a genuine at-scale bug (stage parallelism pinned by file layout,
  * not data size).
  *
  * `ensure` hash-repartitions on the given key ONLY when the input is
  * narrower than the cluster's default parallelism: small inputs pay one
  * proportionally tiny shuffle; wide 100 TB inputs pass through untouched.
  * Hash (not round-robin) so a downstream groupBy/join on the same key can
  * reuse the partitioning instead of exchanging again.
  */
object Spread {

  def ensure(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // toRdd reuses the already-planned queryExecution (no job, no extra
    // InternalRow→Row conversion layer the .rdd accessor would add)
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target, col(key))
    else df
  }
}
