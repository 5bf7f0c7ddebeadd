package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/**
 * Theta-sketch distinct-count aggregate over BIGINT keys: per group,
 * a DataSketches compact theta sketch (binary). Unlike HLL, theta
 * sketches support SET ALGEBRA after aggregation — union,
 * INTERSECTION and difference of the per-group binaries — which is
 * the piece Spark's built-in hll_* family cannot express (HLL unions
 * only). That makes "distinct keys in BOTH segments" answerable from
 * per-segment sketches without re-scanning facts: the 100 TB
 * audience-overlap / cross-partition-distinct pattern.
 *
 * Planned through ObjectHashAggregateExec; the buffer is a theta
 * Union gadget (update(long) hashes the key into the gadget;
 * partial-merge unions the compact form), so map-side state is one
 * bounded sketch per group per partition and the shuffle carries
 * <= 8·2^lgK bytes per group. Below 2^lgK distinct entries the
 * sketch is EXACT (theta = 1, every hash retained) — estimation and
 * its ~1/sqrt(2^lgK) RSE only begin past the nominal capacity.
 *
 * Returns the compact sketch bytes; estimates/set-ops are read with
 * `Sketches.heapifySketch(Memory.wrap(bytes))` driver-side on the
 * group-count-sized result.
 */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be bigint, got $other")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult())
    a
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray()

  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray()

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "theta_sketch_agg"
}

object ThetaSketchAgg {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def sketch(key: Column, lgK: Int): Column =
    GraftSqlBridge.column(
      ThetaSketchAgg(GraftSqlBridge.expression(key), lgK).toAggregateExpression())
}
