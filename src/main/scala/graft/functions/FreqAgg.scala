package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/**
 * Misra-Gries heavy-hitters sketch as a bounded-state aggregate.
 *
 * State is AT MOST k (key, count) entries regardless of input size —
 * the scalable alternative to `groupBy(key).count()` when only the
 * frequent keys matter: at 100 TB a full token count shuffles the
 * entire vocabulary; this sketch's partials are k entries per map
 * task, merged associatively (Agarwal et al., "Mergeable Summaries",
 * PODS 2012 — merge = sum counts, then subtract the (k+1)-th largest
 * and drop non-positives).
 *
 * Guarantee: the sketched count under-estimates a key's true count by
 * at most n/(k+1) (n = total rows seen), and — the property exact
 * consumers build on — EVERY key with true count > n/(k+1) is present
 * in the output. Counts are estimates; use
 * [[graft.operators.HeavyHitters.exactHeavyHitters]] for the
 * candidates→exact-recount composition whose final output is exact.
 *
 * Planned through ObjectHashAggregateExec with map-side partial
 * merge, like [[TopKPairs]].
 */
case class FreqSketch(
    keyExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("token",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("est",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    keyExpr.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"argument must be string, got $t")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Keep at most k entries: subtract the (k+1)-th largest count from
    * every entry and drop the non-positive ones. (For the classic
    * one-at-a-time overflow this is exactly "decrement all by the
    * min"; stated this way it is also the correct MERGE shrink.)
    * The per-ROW overflow (size == k+1, the update hot path) needs no
    * sort — the (k+1)-th largest of k+1 values is the min, one O(k)
    * scan; the general sort runs only on MERGE (once per partial). */
  private def shrink(m: mutable.HashMap[String, Long]): Unit = {
    if (m.size <= k) return
    val d =
      if (m.size == k + 1) {
        var mn = Long.MaxValue
        m.foreach { case (_, c) => if (c < mn) mn = c }
        mn
      } else {
        val counts = m.values.toArray
        java.util.Arrays.sort(counts)
        counts(counts.length - (k + 1)) // (k+1)-th largest
      }
    m.filterInPlace((_, c) => c > d)
    m.mapValuesInPlace((_, c) => c - d)
  }

  override def update(m: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = keyExpr.eval(input)
    if (v != null) {
      // eval may return a buffer-backed UTF8String — materialize
      val key = v.asInstanceOf[UTF8String].toString
      m.updateWith(key) { case Some(c) => Some(c + 1L); case None => Some(1L) }
      shrink(m)
    }
    m
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) =>
      a.updateWith(key) { case Some(c0) => Some(c0 + c); case None => Some(c) }
    }
    shrink(a)
    a
  }

  override def eval(m: mutable.HashMap[String, Long]): Any = {
    // deterministic order: estimate DESC, token ASC
    val entries = m.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    })
  }

  // Length-prefixed UTF-8, not writeUTF: modified-UTF8 caps a key at
  // 65535 encoded bytes and THROWS past it, and this aggregate is
  // SQL-registered over arbitrary string columns.
  override def serialize(m: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + m.size * 24)
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(keyExpr = newChildren(0))
  override def prettyName: String = "freq_sketch"
}

object FreqAgg {
  /** Column API: freqSketch(key, k) -> array<struct<token, est>> of at
    * most k candidate heavy hitters, estimate DESC. */
  def freqSketch(key: Column, k: Int): Column =
    GraftSqlBridge.column(FreqSketch(
      GraftSqlBridge.expression(key), k).toAggregateExpression())
}
