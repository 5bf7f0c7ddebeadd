package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Polynomial rolling-hash document fingerprint:
 *   h = fold(chars)(h, c => (h * 31 + c) % 1000000007)
 *
 * A native Catalyst Expression with `doGenCode` so the whole-stage
 * codegen path stays unbroken (a Scala UDF here would box every row
 * and fence the pipeline). Used for cheap dedup keys / content
 * addressing in the training-data pipeline tier; semantics are
 * deliberately arithmetic-only so an external SQL engine can verify
 * the value (see the doc_fingerprint oracle: the same fold is
 * expressible with list_reduce in DuckDB).
 */
case class RollingHashFingerprint(child: Expression)
    extends UnaryExpression {

  private final val Mod = 1000000007L

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.codePointAt(i)) % Mod
      i += s.offsetByCodePoints(i, 1) - i
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % ${Mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashFingerprint =
    copy(child = newChild)
}

object Fingerprint {
  /** Column API: fingerprint(text) -> long in [0, 1e9+7). */
  def fingerprint(c: Column): Column =
    GraftSqlBridge.column(RollingHashFingerprint(GraftSqlBridge.expression(c)))
}
