package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compiled word-shingling kernel for the dedup tier.
 *
 * Semantics are EXACTLY the SQL pipeline it replaces (the MinHash /
 * Jaccard oracle depends on this):
 *
 *   array_distinct(transform(sequence(1, size(w) - n + 1),
 *     i -> concat_ws(' ', w[i], ..., w[i + n - 1])))
 *   where w = split(text, ' ')        -- empties kept, like Spark split
 *   and fewer than n words => empty array
 *
 * Why an Expression and not the HOF chain: Catalyst evaluates
 * higher-order-function lambdas interpreted, per element, with an
 * allocation per step — measured ~3.6 s per pass over 5k docs at
 * sf0.1, and the dedup pipeline recomputes the spine three times
 * (signature + both verify sides). One compiled pass through a
 * LinkedHashSet is ~100x less work per row, and `doGenCode` emits a
 * single static call so the whole-stage span stays fused.
 */
object ShingleUtil {
  /** Distinct word n-grams of `s` split on a single space (empty
    * tokens kept — `split` semantics), joined with a single space,
    * first-occurrence order. Fewer than n words => empty array. */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(16, words.length * 2))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** `WordShingles(text, n)` -> array<string> of distinct word n-grams. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"argument must be string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ShingleUtil.wordShingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object Shingles {
  /** Column API: distinct word n-gram shingles of a text column. */
  def wordShingles(c: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(c), n))
}
