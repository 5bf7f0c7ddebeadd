package graft

import graft.functions.{DotProduct, RollingHashFingerprint}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * SparkSessionExtensions entry point: registers graft's native
 * expressions as SQL functions, so `spark.sql` users get them too:
 *
 *   SELECT dot_product(a, b), fingerprint(text) FROM ...
 *
 * Wire up with:
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 * or config: spark.sql.extensions=graft.GraftExtensions
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("fingerprint"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RollingHashFingerprint].getName, "fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "fingerprint(str) takes one argument")
        RollingHashFingerprint(args.head)
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args(0), args(1))
      }))
  }
}
