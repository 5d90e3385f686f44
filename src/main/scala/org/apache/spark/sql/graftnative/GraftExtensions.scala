package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL users, so `SELECT dot_f(a, b)` works in plain
  * `spark.sql` (and in thrift/connect frontends that honor extensions).
  *
  * Wire up with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  *   // or spark.sql.extensions=org.apache.spark.sql.graftnative.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_f"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_f expects exactly 2 arguments, got ${children.length}")
        DotProductFloat(children(0), children(1))
      }))
  }
}
