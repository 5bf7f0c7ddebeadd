package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Number of elements of a string array that hit a Bloom filter —
 * the map-side prune of the bloom-prune-then-exact-verify join
 * pattern (the same shape Spark's own runtime row-level filtering
 * uses, here surfaced as a first-class operator primitive).
 *
 * The filter is built once over the BOUNDED side (an eval/benchmark
 * gram set), serialized, and shipped inside the expression; each
 * executor deserializes it once (lazily, and once per codegen
 * reference), then probes are pure in-memory bit tests — the large
 * side is never shuffled and never joined except for the tiny
 * candidate subset that survives the probe.
 *
 * Probes use `mightContainBinary` over the UTF8String's bytes:
 * `BloomFilter.putString` hashes the UTF-8 encoding of the string,
 * so probing the raw bytes is put-compatible without a per-row
 * String allocation (pinned by BloomDecontaminationSpec's
 * no-false-negative check).
 */
case class BloomGramHits(child: Expression, bloomBytes: scala.collection.immutable.ArraySeq[Byte])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string>, got $other")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(bloomBytes.unsafeArray.asInstanceOf[Array[Byte]])

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) &&
        bloom.mightContainBinary(arr.getUTF8String(i).getBytes)) hits += 1
      i += 1
    }
    java.lang.Integer.valueOf(hits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the deserialized filter rides the codegen references array
      // (BloomFilterImpl is java.io.Serializable), so executors pay
      // deserialization once per plan, not per row
      val filterRef = ctx.addReferenceObj("bloomFilter", bloom,
        classOf[BloomFilter].getName)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val hits = ctx.freshName("hits")
      s"""
         |int $hits = 0;
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i) &&
         |      $filterRef.mightContainBinary($c.getUTF8String($i).getBytes())) {
         |    $hits++;
         |  }
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BloomGramHits =
    copy(child = newChild)
}

object BloomProbe {
  /** Column API: bloomGramHits(grams, filterBytes) -> int hit count.
    * The bytes ride as an immutable ArraySeq so two probes built from
    * equal filters are structurally equal (case-class equality over a
    * raw Array is reference equality, which would defeat Catalyst
    * canonicalization: common-subexpression and exchange reuse). */
  def gramHits(grams: Column, bloomBytes: Array[Byte]): Column =
    GraftSqlBridge.column(BloomGramHits(GraftSqlBridge.expression(grams),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bloomBytes)))
}
