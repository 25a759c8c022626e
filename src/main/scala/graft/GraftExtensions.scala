package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloorLog2Capped, Hash48, LongArrayDot, NfcNormalize, RollingHash}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users (and JDBC/Thrift
  * clients on a cluster) can call them without touching the Scala API:
  *
  *   SELECT long_array_dot(a, b) FROM vectors
  *
  * Wire-up options:
  *   - builder: `SparkSession.builder.withExtensions(new GraftExtensions)`
  *   - config:  `--conf spark.sql.extensions=graft.GraftExtensions`
  *     (the standard cluster-wide mechanism — no code change needed)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"long_array_dot expects 2 arguments, got ${children.size}")
        LongArrayDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hash48"),
      new ExpressionInfo(classOf[Hash48].getName, "hash48"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"hash48 expects 1 argument, got ${children.size}")
        Hash48(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"nfc_normalize expects 1 argument, got ${children.size}")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("floor_log2"),
      new ExpressionInfo(classOf[FloorLog2Capped].getName, "floor_log2"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"floor_log2 expects 1 argument, got ${children.size}")
        FloorLog2Capped(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        // rolling_hash(text[, base, mod]) — base/mod must be literal longs
        require(children.size == 1 || children.size == 3,
          s"rolling_hash expects 1 or 3 arguments, got ${children.size}")
        def litLong(e: Expression, name: String): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null => v.toString.toLong
          case _ => throw new IllegalArgumentException(
            s"rolling_hash: $name must be a literal integer")
        }
        if (children.size == 1) RollingHash(children.head, 131L, 1000000007L)
        else RollingHash(children.head,
          litLong(children(1), "base"), litLong(children(2), "mod"))
      }))
  }
}
