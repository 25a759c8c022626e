package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-time scale-up generator for the round-10 scale-validation run:
  * tiles an existing testdata dir N× into `outDir` so the bench suite
  * can be driven at ~10× the largest driver-provided scale factor.
  *
  *   runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10
  *
  * Design goals (so per-entry growth measured on the tiled data is the
  * DATA-scaling signal, not a tiling artifact):
  *
  *  - Replica `i` shifts every entity key by `i · 10⁹` — joins stay
  *    within-replica (fan-outs exactly match the source), and because
  *    10⁹ ≡ 0 (mod 2, mod 50) the `doc_id % 50`-style filters in the
  *    query suite keep their exact selectivity.
  *  - `documents.text` in replicas i>0 is token-REORDERED (tokens
  *    sorted by a replica-salted hash): token multisets — lengths,
  *    stopword ratios, Zipf, vocab, BPE frequencies — are preserved
  *    exactly, while cross-replica shingle/n-gram overlap collapses,
  *    so LSH/minhash candidate generation grows linearly instead of
  *    every doc acquiring N−1 identical twins (a 90%-duplicate corpus
  *    is not what a 10× corpus looks like). Identical source docs get
  *    identical reorderings, so within-replica dup structure survives.
  *  - `embeddings.embedding` in replicas i>0 flips the sign of a
  *    replica-hashed half of the coordinates: norms (and so IVF/PQ
  *    costs) are unchanged, cross-replica cosine collapses.
  *  - region/nation are fixed-size dimensions and are copied as-is.
  *
  * This is a TOOL, not an engine operator — it exists to produce
  * BENCH_r10_sf1 inputs and is never part of a query plan.
  */
object ScaleUp {

  val Off = 1000000000L

  private def shifted(df: DataFrame, i: Int, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Off)))

  /** Replica-distinct text via token RENAMING, not reordering: every
    * token except the six Gopher stopwords and pure-digit words gets a
    * per-replica suffix (`…q3` for replica 3). Natural token ORDER is
    * preserved, so within-replica n-gram statistics, collocations,
    * winnowing fingerprints, planted exact AND near duplicates all
    * behave exactly like the source corpus — while across replicas both
    * the shingle sets (MinHash/Jaccard) and the token BAG (SimHash,
    * which is order-insensitive) become disjoint except for stopwords.
    *
    * Two rejected designs, kept as a warning: (1) hash-SORTING tokens
    * with a replica salt canonicalizes order corpus-wide — docs sharing
    * vocabulary share long shingle runs (measured 26× LSH candidate
    * blowup); (2) per-document-salted sorting fixes that but groups
    * repeated tokens into "the the the" runs whose shingles are shared
    * by nearly every doc (measured 2000× candidate blowup), and any
    * multiset-preserving reorder leaves every replica a bag-of-words
    * DUPLICATE of its source — SimHash-family entries then verify
    * C(10,2) pairs per document. Renaming has none of these modes.
    * Stopwords/digit-words keep the Gopher r_stop and r_digit rules
    * (and so gate selectivity) intact per replica.
    */
  private def renameTokens(c: org.apache.spark.sql.Column, i: Int) =
    array_join(
      transform(split(c, " "), t =>
        when(lower(t).isin("the", "a", "of", "and", "to", "in") ||
            t.rlike("^[0-9]+$") || t === "", t)
          .otherwise(concat(t, lit(s"q$i")))),
      " ")

  private def flipSigns(c: org.apache.spark.sql.Column, i: Int) =
    transform(c, (x, j) =>
      when(pmod(xxhash64(j, lit(i)), lit(2)) === 0, -x).otherwise(x))

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame =
      spark.read.parquet(s"$srcDir/$t.parquet")

    def tile(t: String, parts: Int)(f: (DataFrame, Int) => DataFrame): Unit = {
      val src = read(t)
      val out = (0 until factor).map(i => f(src, i)).reduce(_.unionByName(_))
      out.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")
      println(s"  $t: ${src.count()} -> tiled x$factor")
    }

    // fixed-size dimensions: copy
    for (t <- Seq("region", "nation")) {
      read(t).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"  $t: copied")
    }
    tile("customer", 8)((d, i) => shifted(d, i, "c_custkey"))
    tile("supplier", 4)((d, i) => shifted(d, i, "s_suppkey"))
    tile("part", 8)((d, i) => shifted(d, i, "p_partkey"))
    tile("orders", 16)((d, i) => shifted(d, i, "o_orderkey", "o_custkey"))
    tile("lineitem", 32)((d, i) =>
      shifted(d, i, "l_orderkey", "l_partkey", "l_suppkey"))
    tile("events", 32)((d, i) => shifted(d, i, "event_id", "user_id"))
    tile("documents", 32) { (d, i) =>
      val s = shifted(d, i, "doc_id")
      if (i == 0) s
      else s.withColumn("text", renameTokens(col("text"), i))
        .withColumn("n_chars", length(col("text")))
    }
    tile("embeddings", 16) { (d, i) =>
      val s = shifted(d, i, "vec_id")
      if (i == 0) s
      else s.withColumn("embedding",
        flipSigns(col("embedding"), i).cast("array<float>"))
    }
    println(s"ScaleUp done: $outDir (factor $factor)")
    spark.stop()
  }
}
