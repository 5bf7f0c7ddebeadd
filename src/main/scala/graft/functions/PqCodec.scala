package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native PQ / LSH kernels that carry their model data (codebooks,
 * distance tables, hyperplanes) as REFERENCE OBJECTS instead of plan
 * literals.
 *
 * The literal form (element_at over `array(lit, lit, ...)` per code
 * per subspace) has two scale defects the reference-object form
 * removes: the janino source grows with m*k*dim until whole-stage
 * codegen aborts at the 64KB method limit (falling back to
 * interpreted eval on the hot path), and the plan — hence every task
 * binary — carries the codebook as expression TREE (~1.4 MiB task
 * broadcast at m=8,k=16). Here the arrays ride Java serialization
 * once per stage (KBs) and the generated code is a fixed-size loop
 * nest independent of m/k/dim.
 *
 * Numeric contract: every fold accumulates left-to-right in ascending
 * index order — bit-identical to the literal expressions it replaces
 * (and to DuckDB's list functions, which PqSpec and the sim_pq_exact
 * oracle rely on). Null elements count as 0 like [[DotProduct]]; a
 * vector shorter than the declared dim yields NULL (a malformed row
 * must not crash a 100 TB scoring pass).
 */
object PqCodec {

  /** argmin-encode a vector to its m nearest-subspace-code indices. */
  def encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqEncodeExpr(GraftSqlBridge.expression(vec), codebooks))

  /** ADC score from a precomputed (subspace x code) distance table. */
  def adc(code: Column, dtable: Array[Array[Double]]): Column =
    GraftSqlBridge.column(PqAdcExpr(GraftSqlBridge.expression(code), dtable))

  /** Batch ADC: decode-against-codebooks distance to a probe column. */
  def adcBatch(code: Column, probe: Column,
               codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqAdcBatchExpr(
      GraftSqlBridge.expression(code), GraftSqlBridge.expression(probe), codebooks))

  /** nBits-bit hyperplane signature (planes precomputed once). */
  def hyperplaneSig(vec: Column, dim: Int, nBits: Int): Column =
    GraftSqlBridge.column(HyperplaneSigExpr(
      GraftSqlBridge.expression(vec),
      Array.tabulate(nBits, dim)(planeWeight)))

  /** Deterministic pseudo-random plane weight for (plane p, dim d) in
    * [-0.5, 0.5): splitmix64 finalizer — no RNG state, identical
    * everywhere. */
  def planeWeight(p: Int, d: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }
}

/** vec: array<double> (length >= m*sub) -> array<int> of m codes;
  * ties break to the LOWER code, deterministically. */
case class PqEncodeExpr(child: Expression,
                        codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty &&
    codebooks.head.head.nonEmpty, "pq_encode: empty codebooks")
  private val m = codebooks.length
  private val k = codebooks.head.length
  private val sub = codebooks.head.head.length
  // a jagged codebook would mis-slice vectors executor-side (longer
  // centroids silently ignored, shorter ones AIOOBE mid-task) —
  // reject at construction, on the driver
  require(codebooks.forall(c => c.length == k && c.forall(_.length == sub)),
    s"pq_encode: jagged codebooks (expected uniform $m x $k x $sub)")

  // Array fields make the synthesized equals/hashCode identity-based,
  // so semantically equal kernels never canonicalize together (missed
  // common-subexpression elimination). Deep comparison restores value
  // semantics.
  override def equals(other: Any): Boolean = other match {
    case that: PqEncodeExpr => child == that.child &&
      java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]],
        that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires array<double>, got $t")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < m * sub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = codebooks(j)
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var s = 0.0
        var i = 0
        while (i < sub) {
          val x = (if (a.isNullAt(j * sub + i)) 0.0 else a.getDouble(j * sub + i)) - cents(c)(i)
          s += x * x
          i += 1
        }
        if (s < bd) { bd = s; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val cents = ctx.freshName("cents")
      val best = ctx.freshName("best"); val bd = ctx.freshName("bd")
      val s = ctx.freshName("s"); val x = ctx.freshName("x")
      s"""
         |if ($v.numElements() < ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double[][] $cents = $cb[$j];
         |    int $best = 0; double $bd = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $cents.length; $c++) {
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        double $x = ($v.isNullAt($j * $sub + $i) ? 0.0 : $v.getDouble($j * $sub + $i)) - $cents[$c][$i];
         |        $s += $x * $x;
         |      }
         |      if ($s < $bd) { $bd = $s; $best = $c; }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** code: array<int> (length m) -> sum_j dtable[j][code[j]]. */
case class PqAdcExpr(child: Expression, dtable: Array[Array[Double]])
  extends UnaryExpression {

  require(dtable.nonEmpty && dtable.head.nonEmpty, "pq_adc: empty dtable")
  private val m = dtable.length
  require(dtable.forall(_.length == dtable.head.length),
    s"pq_adc: jagged dtable (expected uniform $m x ${dtable.head.length})")

  override def equals(other: Any): Boolean = other match {
    case that: PqAdcExpr => child == that.child &&
      java.util.Arrays.deepEquals(
        dtable.asInstanceOf[Array[AnyRef]], that.dtable.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(dtable.asInstanceOf[Array[AnyRef]])

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires array<int>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (a.isNullAt(j)) return null
      val code = a.getInt(j)
      if (code < 0 || code >= dtable(j).length) return null
      acc += dtable(j)(code)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val dt = ctx.addReferenceObj("pqDtable", dtable, "double[][]")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j"); val code = ctx.freshName("code")
      s"""
         |if ($v.numElements() < $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    if ($v.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    int $code = $v.getInt($j);
         |    if ($code < 0 || $code >= $dt[$j].length) { ${ev.isNull} = true; break; }
         |    $acc += $dt[$j][$code];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PqAdcExpr =
    copy(child = c)
  override def prettyName: String = "pq_adc"
}

/** (code: array<int>, probe: array<double>) -> L2^2 between the
  * DECODED centroids and the probe — the multi-probe ADC where the
  * distance table cannot be precomputed driver-side. */
case class PqAdcBatchExpr(left: Expression, right: Expression,
                          codebooks: Array[Array[Array[Double]]])
  extends BinaryExpression {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty &&
    codebooks.head.head.nonEmpty, "pq_adc_batch: empty codebooks")
  private val m = codebooks.length
  private val k = codebooks.head.length
  private val sub = codebooks.head.head.length
  require(codebooks.forall(c => c.length == k && c.forall(_.length == sub)),
    s"pq_adc_batch: jagged codebooks (expected uniform $m x $k x $sub)")

  override def equals(other: Any): Boolean = other match {
    case that: PqAdcBatchExpr => left == that.left && right == that.right &&
      java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]],
        that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_batch requires (array<int>, array<double>), got $t")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val code = l.asInstanceOf[ArrayData]
    val probe = r.asInstanceOf[ArrayData]
    if (code.numElements() < m || probe.numElements() < m * sub) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (code.isNullAt(j)) return null
      val c = code.getInt(j)
      if (c < 0 || c >= codebooks(j).length) return null
      val cents = codebooks(j)(c)
      var s = 0.0
      var i = 0
      while (i < sub) {
        val x = cents(i) - (if (probe.isNullAt(j * sub + i)) 0.0 else probe.getDouble(j * sub + i))
        s += x * x
        i += 1
      }
      acc += s
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codeV, probeV) => {
      val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val cents = ctx.freshName("cents")
      val x = ctx.freshName("x")
      s"""
         |if ($codeV.numElements() < $m || $probeV.numElements() < ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    if ($codeV.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    int $c = $codeV.getInt($j);
         |    if ($c < 0 || $c >= $cb[$j].length) { ${ev.isNull} = true; break; }
         |    double[] $cents = $cb[$j][$c];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $x = $cents[$i] - ($probeV.isNullAt($j * $sub + $i) ? 0.0 : $probeV.getDouble($j * $sub + $i));
         |      $s += $x * $x;
         |    }
         |    $acc += $s;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcBatchExpr =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_batch"
}

/** vec: array<double> -> nBits-bit signature long; bit p is set iff
  * dot(vec, plane_p) >= 0. Folds to the shorter of (vec, dim) like
  * [[DotProduct]]; null elements count as 0. */
case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.head.nonEmpty, "hyperplane_sig: empty planes")
  private val nBits = planes.length
  private val dim = planes.head.length
  require(planes.forall(_.length == dim),
    s"hyperplane_sig: jagged planes (expected uniform $nBits x $dim)")

  override def equals(other: Any): Boolean = other match {
    case that: HyperplaneSigExpr => child == that.child &&
      java.util.Arrays.deepEquals(
        planes.asInstanceOf[Array[AnyRef]], that.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sig requires array<double>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    var bits = 0L
    var p = 0
    while (p < nBits) {
      val plane = planes(p)
      var acc = 0.0
      var d = 0
      while (d < n) {
        if (!a.isNullAt(d)) acc += a.getDouble(d) * plane(d)
        d += 1
      }
      if (acc >= 0.0) bits |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val bits = ctx.freshName("bits"); val n = ctx.freshName("n")
      val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val plane = ctx.freshName("plane")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long $bits = 0L;
         |for (int $p = 0; $p < $nBits; $p++) {
         |  double[] $plane = $pl[$p];
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$v.isNullAt($d)) $acc += $v.getDouble($d) * $plane[$d];
         |  }
         |  if ($acc >= 0.0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneSigExpr =
    copy(child = c)
  override def prettyName: String = "hyperplane_sig"
}
