package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers called from both interpreted eval and generated Java
  * (standalone objects get a mirror class with static forwarders, so
  * `graft.functions.NativeHashUtil.hash48(...)` resolves from codegen).
  */
object NativeHashUtil {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 48 bits (6 bytes, big-endian) of md5 over the string's UTF-8
    * bytes — numerically identical to parsing the first 12 hex digits of
    * the md5 hex string, without materializing the hex string.
    */
  def hash48(s: UTF8String): Long = {
    val m = md5.get()
    m.reset()
    val d = m.digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Unicode NFC (canonical composition) of a string — the
    * normalization pass every text pipeline needs before hashing:
    * 'é' (U+00E9) and 'e'+U+0301 are byte-different, render-identical,
    * and MUST collide in dedup keys. java.text.Normalizer implements
    * the Unicode canonical algorithm, the same one DuckDB's
    * nfc_normalize binds — canonical composition is fully specified by
    * the standard, so the two agree on every input.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan; most corpus
    // text is ASCII/NFC already and skips the composing pass entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Left-to-right polynomial fold over the string's code points:
    * h = (h·base + cp) mod m. Matches the portable
    * `aggregate(split(text, ""), 0, (acc, c) -> (acc·base + ascii(c)) % m)`
    * formulation (Java regex split("") yields per-code-point strings;
    * ascii() is codePointAt(0)) in one fused loop with no allocation.
    */
  def rollingHash(s: UTF8String, base: Long, m: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * base + cp) % m
      i += Character.charCount(cp)
    }
    h
  }
}

/** Native codegen'd 48-bit md5 hash of a string column. The portable
  * chain `conv(substring(md5(cast(c as binary)), 1, 12), 16, 10)` is
  * semantically identical but allocates a 32-char hex string, a substring
  * copy, and a decimal-string parse per row — this expression is one
  * digest + a 6-byte combine. It is the hot inner hash of every shingle /
  * MinHash / SimHash / KMV operator (millions of calls per partition at
  * scale), and the DuckDB oracle form
  * `('0x'||substr(md5(s),1,12))::BIGINT` is unchanged.
  */
case class Hash48(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  // SQL callers (GraftExtensions) pass arbitrary columns — implicit-cast
  // to string at analysis time instead of a runtime ClassCastException
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    NativeHashUtil.hash48(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeHashUtil.hash48($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash48 =
    copy(child = newChild)
}

object Hash48 {
  def apply(c: Column): Column = Bridge.column(Hash48(Bridge.expression(c)))
}

/** Native codegen'd Rabin–Karp rolling hash of a whole string column
  * (see [[NativeHashUtil.rollingHash]]). Replaces the
  * `aggregate(split(text, ""), ...)` higher-order-function form, which
  * materializes a one-char-per-element array and folds it with an
  * interpreted lambda — per-character allocation on every row.
  */
case class RollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    NativeHashUtil.rollingHash(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeHashUtil.rollingHash($c, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def apply(c: Column, base: Long, mod: Long): Column =
    Bridge.column(RollingHash(Bridge.expression(c), base, mod))
}

/** Native codegen'd Unicode NFC normalization (see
  * [[NativeHashUtil.nfc]]). Spark has no built-in normalization
  * function; a Scala UDF would break whole-stage codegen in the middle
  * of every text pipeline's hottest map stage — this stays fused, with
  * an isNormalized fast path for the (dominant) already-NFC rows.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    NativeHashUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeHashUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}

/** Native codegen'd capped floor-log₂ for the log-histogram sketch
  * family: EXACTLY the value of the 39-term comparison sum
  * Σ_{k=1..39} [v ≥ 2^k] — 0 for v ≤ 1 (and for v ≤ 0, which the
  * callers filter anyway), capped at 39 — but as ONE
  * `numberOfLeadingZeros` instruction instead of a 39-branch CASE
  * chain per row. Integer bit arithmetic, so it is bit-identical to
  * the comparison sum on every Long (pinned in NativeHashesSpec); the
  * float-log2 cross-engine divergence the comparison sum exists to
  * avoid never enters.
  */
case class FloorLog2Capped(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    if (v <= 0L) 0
    else math.min(39, 63 - java.lang.Long.numberOfLeadingZeros(v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"($c <= 0L) ? 0 : java.lang.Math.min(39, 63 - java.lang.Long.numberOfLeadingZeros($c))")

  override protected def withNewChildInternal(
      newChild: Expression): FloorLog2Capped = copy(child = newChild)
}

object FloorLog2Capped {
  def apply(c: Column): Column =
    Bridge.column(FloorLog2Capped(Bridge.expression(c)))
}
