package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Portable Bloom filter over the deterministic 48-bit hash family —
  * membership-at-scale without a join: build a bit array from the
  * (small) reference set, broadcast the words, and probe with pure
  * column expressions. The canonical LLM-pipeline use is train-side
  * decontamination: the eval/benchmark fingerprint set becomes a few KB
  * of bits, and screening a 100 TB corpus is a map-only stage — no
  * shuffle of the corpus, no join, with the classic Bloom guarantee
  * (no false negatives; false positives at the designed rate).
  *
  * Everything is deterministic: position `i` of value `v` is
  * hash48(v || "#i") mod bits, so any engine — including the DuckDB
  * oracle, which replays membership as position-set containment, the
  * semantically identical formulation — reproduces the same bits and
  * the same false positives.
  */
object Bloom {

  /** The k probe positions of a value (array<int>, each in [0, bits)). */
  def positions(value: Column, k: Int, bits: Int): Column =
    array((0 until k).map(i =>
      (Portable.hash48(concat(value, lit("#" + i))) % bits).cast("int")): _*)

  /** Build the filter: a ONE-row frame with column `bloom` =
    * array<long> of bits/64 words. Distributed: positions explode and
    * OR-aggregate per word; only the words (bits/8 bytes total) ever
    * reach one place.
    */
  def build(df: DataFrame, value: Column, k: Int, bits: Int): DataFrame = {
    require(bits % 64 == 0, s"bits=$bits not a multiple of 64")
    val words = bits / 64
    df.select(explode(positions(value, k, bits)).as("pos")).distinct()
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), col("pos") % 64).as("b"))
      .groupBy("w").agg(call_function("bit_or", col("b")).as("word"))
      .agg(map_from_arrays(collect_list(col("w")),
        collect_list(col("word"))).as("m"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("bloom"))
  }

  /** Probe: true iff every one of the value's k bits is set (possible
    * false positive, never a false negative).
    */
  def mightContain(bloom: Column, value: Column, k: Int, bits: Int): Column =
    forall(positions(value, k, bits), p =>
      element_at(bloom, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), p % 64)) =!= lit(0L))
}
