package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Count of array elements strictly less than a value — the bucket
 * assignment of a row against broadcast range boundaries (see
 * operators/Ranking.segmentedRanks). Exists because the equivalent
 * `size(filter(arr, b -> b < v))` runs the lambda INTERPRETED per
 * row (Catalyst HOFs are CodegenFallback) — this is a straight-line
 * codegen loop instead. Null elements are not counted; a null value
 * yields null (standard binary-expression null semantics).
 */
case class ArrayCountLess(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"arguments must be (array<double>, double), got ($l, $r)")
    }

  override def nullSafeEval(arrAny: Any, vAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val v = vAny.asInstanceOf[Double]
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && arr.getDouble(i) < v) n += 1
      i += 1
    }
    java.lang.Integer.valueOf(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, v) => {
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val n = ctx.freshName("n")
      s"""
         |int $n = 0;
         |int $len = $arr.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i) && $arr.getDouble($i) < $v) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCountLess =
    copy(left = newLeft, right = newRight)
}

object ArrayCountLess {
  /** Column API: countLess(boundaries, v) -> #boundaries strictly < v. */
  def countLess(arr: Column, v: Column): Column =
    GraftSqlBridge.column(ArrayCountLess(
      GraftSqlBridge.expression(arr), GraftSqlBridge.expression(v)))
}
