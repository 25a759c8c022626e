package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (whole-stage codegen; no UDFs), embarrassingly parallel —
  * a map-only stage at any scale.
  */
object TextOps {

  /** Minimal English stopword set for the n-gram language heuristic. */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  /** Language-ID heuristic: fraction of tokens that are English stopwords
    * (integer-ratio compare: stop_hits*5 >= n_tokens ⇔ ratio ≥ 0.2).
    * Emits (n_tokens, stop_hits, lang_pred).
    */
  def langId(text: Column): Seq[Column] = {
    val toks = Portable.tokens(text)
    val hits = size(filter(toks, t => array_contains(typedLit(EnStopwords), t)))
    Seq(
      size(toks).cast("long").as("n_tokens"),
      hits.cast("long").as("stop_hits"),
      when(hits * 5 >= size(toks), "en").otherwise("other").as("lang_pred"))
  }

  /** Quality metrics: char/token counts, mean token length, alpha and
    * space character counts, and a deterministic integer quality score.
    *
    * The character-class counts are computed by `translate` deletion
    * (length(text) − length(text minus the class)), not regex, and the
    * token-length sum is the non-whitespace character count — same values
    * as the regex/fold formulation, but no regex engine and no interpreted
    * per-token lambda in the hot loop (this is a map stage over every
    * document at 100 TB).
    */
  def quality(text: Column): Seq[Column] = {
    val toks = Portable.tokens(text)
    val nTokens = size(toks)
    val charLen = length(text)
    val alphabet = ('a' to 'z').mkString + ('A' to 'Z').mkString
    val alphaLen = charLen - length(translate(text, alphabet, ""))
    val spaceLen = charLen - length(translate(text, " ", ""))
    // Java \s = [ \t\n\x0B\f\r]: sum of whitespace-token lengths is
    // exactly the non-whitespace character count
    val tokLenSum =
      length(translate(text, " \t\n\u000B\f\r", "")).cast("long")
    Seq(
      charLen.cast("long").as("n_chars_m"),
      nTokens.cast("long").as("n_tokens"),
      round(tokLenSum.cast("double") / nTokens, 4).as("mean_tok_len"),
      alphaLen.cast("long").as("n_alpha"),
      spaceLen.cast("long").as("n_space"),
      // score: 1 point each for [50,2000] chars, >=10 tokens, alpha-dominant
      (when(charLen.between(50, 2000), 1).otherwise(0) +
        when(nTokens >= 10, 1).otherwise(0) +
        when(alphaLen * 2 >= charLen, 1).otherwise(0)).cast("long").as("quality_score"))
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * (letter runs / digit runs / single other non-space chars).
    */
  def tokenCounts(text: Column): Seq[Column] = Seq(
    size(Portable.tokens(text)).cast("long").as("ws_tokens"),
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long").as("bpe_tokens"))

  /** Document fingerprint: minimum md5 over distinct word n-gram shingles
    * (a 1-permutation MinHash — robust to token reordering at the edges;
    * the full-signature variant lives in [[Dedup]]). Falls back to
    * md5(text) for documents shorter than n words.
    */
  def fingerprint(text: Column, n: Int): Column = {
    val sh = Portable.shingles(Portable.tokens(text), n)
    coalesce(
      array_min(transform(sh, s => md5(s.cast("binary")))),
      md5(text.cast("binary"))).as("fingerprint")
  }

  /** Polynomial (Rabin–Karp-style) rolling hash of the whole document:
    * h = fold over character codes of (h·B + c) mod M — the classic
    * content-defined-chunking/fingerprint primitive. Exact modular
    * integer arithmetic left-to-right, so any engine reproduces it
    * bit-for-bit (DuckDB: list_reduce over unicode codes with the same
    * fold). B·M < 2⁶³ keeps the fold overflow-free in Long.
    */
  def rollingHash(text: Column, base: Long = 131L,
      mod: Long = 1000000007L): Column =
    graft.functions.RollingHash(text, base, mod)

  /** The higher-order-function form of [[rollingHash]] — kept as the
    * executable spec the native expression is checked against. Not for
    * hot paths: `split(text, "")` materializes a one-char-per-element
    * array and the fold lambda runs interpreted on every row.
    */
  def rollingHashHof(text: Column, base: Long = 131L,
      mod: Long = 1000000007L): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * base + ascii(c)) % mod)

  /** [[fingerprint]] as explode → groupBy min: one md5 per (doc, shingle)
    * in codegen, one shuffle on id, instead of the per-row interpreted
    * transform+array_min lambda pipeline. Short documents (no shingles →
    * no exploded rows) fall back to md5(text) through the left join.
    * Output: (idCol, fingerprint).
    */
  def fingerprintTable(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val mins = Dedup.shingleTable(df, idCol, textCol, n)
      .groupBy("id")
      .agg(min(md5(col("shingle").cast("binary"))).as("fp"))
    df.select(col(idCol), col(textCol).as("_text"))
      .join(mins.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("fp"), md5(col("_text").cast("binary"))).as("fingerprint"))
  }
}
