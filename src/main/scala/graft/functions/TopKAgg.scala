package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate: per group, the k largest (value, payload)
 * pairs — value DESC, ties broken payload ASC, matching
 * `ROW_NUMBER() OVER (ORDER BY value DESC, payload ASC) <= k`.
 *
 * This is the scalable form of per-group top-k. The window form sorts
 * EVERY row of every group; this aggregate's partial (map-side) state
 * is a k-element heap per group, so the shuffle carries at most
 * k rows per group per input partition, and no sort of the full data
 * ever happens — at 100 TB that is the difference between a top-3
 * report and a full-table sort. Planned through
 * ObjectHashAggregateExec (Spark's TypedImperativeAggregate path)
 * with partial merge on the map side.
 *
 * Shape is (DOUBLE value, BIGINT payload) — score + row identity, the
 * retrieval/top-k-report shape; callers cast in. Nulls in either
 * input are ignored (SQL aggregate convention).
 */
case class TopKPairs(
    valueExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKAgg.Pair]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(valueExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (valueExpr.dataType, payloadExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (v, p) => TypeCheckResult.TypeCheckFailure(
        s"arguments must be (double, bigint), got ($v, $p)")
    }

  // min-heap whose head is the WORST kept pair (smallest value, then
  // LARGEST payload — the first to evict), so keeping the k best is
  // one peek + one replace. Initial capacity is CAPPED: k is a
  // logical bound, not a size hint — the staged-retrieval exactness
  // twins pass shortlists of k·10^6 that must bound the heap without
  // preallocating a multi-megabyte array per group buffer (the queue
  // grows on demand past the cap).
  override def createAggregationBuffer(): java.util.PriorityQueue[TopKAgg.Pair] =
    new java.util.PriorityQueue[TopKAgg.Pair](math.min(k, 4096) + 1, TopKAgg.worstFirst)

  override def update(heap: java.util.PriorityQueue[TopKAgg.Pair],
                      input: InternalRow): java.util.PriorityQueue[TopKAgg.Pair] = {
    val v = valueExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (v != null && p != null) {
      TopKAgg.offer(heap, k, v.asInstanceOf[Double], p.asInstanceOf[Long])
    }
    heap
  }

  override def merge(a: java.util.PriorityQueue[TopKAgg.Pair],
                     b: java.util.PriorityQueue[TopKAgg.Pair]): java.util.PriorityQueue[TopKAgg.Pair] = {
    val it = b.iterator()
    while (it.hasNext) {
      val pr = it.next()
      TopKAgg.offer(a, k, pr.value, pr.payload)
    }
    a
  }

  override def eval(heap: java.util.PriorityQueue[TopKAgg.Pair]): Any = {
    val arr = heap.toArray(new Array[TopKAgg.Pair](heap.size()))
    // best first: value DESC, payload ASC
    java.util.Arrays.sort(arr, TopKAgg.worstFirst.reversed())
    new GenericArrayData(arr.map(p => InternalRow(p.value, p.payload): Any))
  }

  override def serialize(heap: java.util.PriorityQueue[TopKAgg.Pair]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + heap.size() * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size())
    val it = heap.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeDouble(p.value)
      out.writeLong(p.payload)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKAgg.Pair] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) {
      heap.add(new TopKAgg.Pair(in.readDouble(), in.readLong()))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(valueExpr = newChildren(0), payloadExpr = newChildren(1))
  override def prettyName: String = "topk_pairs"
}

object TopKAgg {

  final class Pair(val value: Double, val payload: Long)

  /** -0.0 normalized to 0.0 FOR COMPARISON ONLY: SQL ordering treats
    * them as equal ties (broken by payload), but Double.compare ranks
    * 0.0 above -0.0 — without this a {0.0, -0.0} tie would diverge
    * from the window form. The STORED value stays raw, so the emitted
    * pair carries exactly the input double the window form would have
    * emitted (a caller hashing output values sees no -0.0 -> 0.0
    * rewrite). */
  @inline private def norm(v: Double): Double = if (v == 0.0d) 0.0d else v

  /** Heap order: head = worst kept = smallest value, ties LARGEST
    * payload (mirrors ORDER BY value DESC, payload ASC winners). */
  val worstFirst: java.util.Comparator[Pair] = new java.util.Comparator[Pair] {
    override def compare(a: Pair, b: Pair): Int = {
      val c = java.lang.Double.compare(norm(a.value), norm(b.value))
      if (c != 0) c else java.lang.Long.compare(b.payload, a.payload)
    }
  }

  private[functions] def offer(heap: java.util.PriorityQueue[Pair], k: Int,
                               v: Double, p: Long): Unit = {
    if (heap.size() < k) {
      heap.add(new Pair(v, p))
    } else {
      val worst = heap.peek()
      // candidate beats the worst kept pair?
      val c = java.lang.Double.compare(norm(v), norm(worst.value))
      if (c > 0 || (c == 0 && p < worst.payload)) {
        heap.poll()
        heap.add(new Pair(v, p))
      }
    }
  }

  /** Column API: topK(value, payload, k) -> array<struct<value,payload>>
    * of the k largest, best first. */
  def topK(value: Column, payload: Column, k: Int): Column =
    GraftSqlBridge.column(TopKPairs(
      GraftSqlBridge.expression(value),
      GraftSqlBridge.expression(payload), k).toAggregateExpression())
}
