package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic building blocks shared by the extension
  * operators and their DuckDB oracles.
  *
  * Every construct here has an exactly-equivalent DuckDB SQL form (used in
  * the oracle strings), so operator outputs hash-match bit-for-bit:
  *  - hash48: first 12 hex digits of md5 as a 48-bit integer
  *    (DuckDB: `('0x' || substr(md5(s),1,12))::BIGINT`);
  *  - integer quantization for float vectors (exact integer dot products);
  *  - whitespace tokenization and word n-gram shingles via higher-order
  *    array functions (codegen-friendly, no UDFs).
  */
object Portable {

  /** Large prime modulus for the MinHash permutation family. */
  val P: Long = 1000000007L

  /** 48-bit md5-derived hash of a string column — portable, deterministic,
    * order-free. Implemented as the native codegen'd [[Hash48]] expression
    * (one digest + 6-byte combine per row); [[hash48Chain]] is the
    * built-in-expression formulation it is bit-identical to.
    */
  def hash48(c: Column): Column = Hash48(c.cast("string"))

  /** The composed built-in form of [[hash48]] (md5 hex → substring →
    * conv) — kept as the executable spec the native expression is checked
    * against, and as the portable fallback for hosts that strip custom
    * expressions.
    */
  def hash48Chain(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 12), 16, 10).cast("long")

  /** hash48 reduced mod P (safe operand for the a*h+b MinHash family). */
  def hash48p(c: Column): Column = hash48(c) % P

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct word n-gram shingles of a token array; empty array for
    * inputs shorter than n (guarded — Spark's `sequence(0, -1)` would
    * descend, not return empty).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Quantize a float-vector column to exact integers (×scale, rounded).
    * Dot products of quantized vectors are exact in Long — aggregation
    * order can no longer change the result, which is what makes
    * similarity scores reproducible across engines and cluster sizes.
    */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd expression ([[LongArrayDot]]); the equivalent
    * `aggregate(zip_with(...))` formulation allocates an intermediate
    * array and runs interpreted per row.
    */
  def dotQ(a: Column, b: Column): Column = LongArrayDot.dot(a, b)

  /** Cosine from exact integer dots: dot/(sqrt(na)*sqrt(nb)), rounded to
    * `digits` — IEEE double ops on exact integers, identical everywhere.
    */
  def cosineQ(dot: Column, normA: Column, normB: Column, digits: Int): Column =
    round(dot.cast("double") /
      (sqrt(normA.cast("double")) * sqrt(normB.cast("double"))), digits)
}
