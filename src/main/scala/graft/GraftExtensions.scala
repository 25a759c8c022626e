package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.LongArrayDot

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
  }
}
