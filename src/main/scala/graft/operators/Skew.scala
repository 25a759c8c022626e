package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salting for hot keys. AQE's skew-join
  * splitting handles sort-merge joins automatically; these helpers cover
  * the two shapes AQE doesn't: skewed *aggregations* and broadcast-side
  * replication joins against a salted fact.
  *
  * Salt is deterministic (hash of the whole row modulo fan-out), so
  * results are reproducible — no rand().
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (key, salt), then finish on key. `partials` maps each aggregate to
    * its (partial, merge) pair — e.g. count→(count, sum), sum→(sum, sum).
    *
    * For the common count/sum case use [[saltedCountSum]].
    */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], sumCol: Option[String],
      fanout: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(fanout)))
    val partial = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_n"),
        sumCol.map(c => sum(col(c)).as("_s"))
          .getOrElse(lit(0L).as("_s")))
    val aggs = Seq(sum(col("_n")).as("n")) ++
      sumCol.map(_ => sum(col("_s")).as("s"))
    partial.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Salted equi-join of a skewed fact against a small dimension: the
    * fact gets a deterministic salt in [0, fanout); the dimension is
    * replicated fanout× with an exploded salt column; the join key
    * becomes (key, salt), splitting each hot key across fanout
    * partitions. The dimension side must be broadcast-sized × fanout.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      fanout: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.toIndexedSeq.map(col): _*), lit(fanout)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(fanout - 1))))
    saltedFact.join(broadcast(replicatedDim), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Salting PLAN for a skewed key — the advisor feeding [[saltedJoin]]
    * / [[saltedCountSum]] fan-outs and AQE skew thresholds: every key
    * whose row count exceeds `targetPerSalt` (the rows one task should
    * hold — partition-size budget over row width) with the MINIMAL
    * replication factor that brings each salt shard back under the
    * budget, ⌈count / target⌉. Emitting a PLAN instead of hardcoding a
    * global fan-out is the difference between salting one hot key 40×
    * and salting every key 40× (a 40× dimension blow-up in the
    * replicated join).
    *
    * One aggregate to the key domain, one filter — the plan frame is
    * hot-keys-only, broadcastable by construction.
    *
    * Output: (key, n_rows, salt_factor), salt_factor ≥ 2, i.e. only
    * keys that need splitting; an empty result means the key is safe.
    */
  def saltPlan(df: DataFrame, keyCol: Column,
      targetPerSalt: Long): DataFrame = {
    require(targetPerSalt >= 1, s"targetPerSalt: $targetPerSalt")
    df.select(keyCol.as("key")).groupBy("key")
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > targetPerSalt)
      .withColumn("salt_factor",
        expr(s"(n_rows + $targetPerSalt - 1) div $targetPerSalt"))
  }
}
