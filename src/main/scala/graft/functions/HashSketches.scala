package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compiled per-document hash sketches for the dedup tier.
 *
 * Both kernels replicate the exact bit patterns of the SQL
 * formulations they replace (pinned by HashSketchesSpec), built from
 * Spark's own XXH64 with the xxhash64 expression's seed (42) and
 * per-type chaining (hashLong for longs, hashInt for int literals,
 * hashUnsafeBytes for strings). Replacing a 128-column (resp.
 * 64-column) aggregation over exploded shingle/token rows with one
 * compiled pass per document removes the explode, the wide codegen
 * aggregate (a Janino compile cost on every fresh plan), and the
 * map-side partial machinery — the sketch becomes a narrow projection
 * with NO shuffle, which is exactly the shape that scales: signatures
 * for 100 TB of documents are computed where the documents already
 * live, and only the (band, key) buckets move.
 */
object HashSketchUtil {
  private final val Seed = 42L

  private def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** MinHash band keys from a distinct-shingle array.
    * Slot i of the signature is min over shingles of
    * xxhash64(xxhash64(shingle), i); band b's key is
    * xxhash64(slot[b*r], ..., slot[b*r+r-1]) with r = k / bands.
    * Empty array => null (no signature, matches the dropped-doc
    * semantics of the SQL pipeline). */
  def minhashBandKeys(shingles: ArrayData, k: Int, bands: Int): ArrayData = {
    val n = shingles.numElements()
    var seen = 0
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 0
    while (s < n) {
      // Null elements are skipped (the SQL min-aggregation this
      // replaces ignored nulls too; WordShingles never emits them, but
      // the SQL-registered function accepts arbitrary arrays).
      val u = shingles.getUTF8String(s)
      if (u != null) {
        seen += 1
        // xxhash64(shingle) then xxhash64(h0, i): each SQL child chains
        // through the running hash starting at seed 42.
        val h0 = hashUtf8(u, Seed)
        val inner = XXH64.hashLong(h0, Seed)
        var i = 0
        while (i < k) {
          val g = XXH64.hashInt(i, inner)
          if (g < mins(i)) mins(i) = g
          i += 1
        }
      }
      s += 1
    }
    if (seen == 0) return null
    val r = k / bands
    val keys = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var key = Seed
      var j = b * r
      while (j < (b + 1) * r) { key = XXH64.hashLong(mins(j), key); j += 1 }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** 64-bit SimHash over the distinct space-split tokens of `text`:
    * bit j is set iff Σ_tokens (bit j of xxhash64(token) ? +1 : -1)
    * is > 0. Identical to the explode + 64-sum SQL aggregation. */
  def simhash64(text: UTF8String, out: Array[Int]): Long = {
    val words = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](math.max(16, words.length * 2))
    val counts = out // reuse caller scratch: 64 slots
    java.util.Arrays.fill(counts, 0)
    var total = 0
    var i = 0
    while (i < words.length) {
      if (seen.add(words(i))) {
        val h = hashUtf8(UTF8String.fromString(words(i)), Seed)
        var j = 0
        while (j < 64) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
        total += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    // sum over tokens of (+1 | -1) = 2*ones - total; bit set iff > 0
    while (j < 64) { if (2 * counts(j) > total) fp |= (1L << j); j += 1 }
    fp
  }

  def simhash64(text: UTF8String): Long = simhash64(text, new Array[Int](64))
}

/** `MinHashBandKeys(shingles, k, bands)` -> array<long> of band keys
  * (position = band index), or null for an empty shingle set. */
case class MinHashBandKeys(child: Expression, k: Int, bands: Int) extends UnaryExpression {
  require(k > 0 && bands > 0 && k % bands == 0,
    s"k must be a positive multiple of bands, got k=$k bands=$bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty shingle arrays map to null signatures
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"argument must be array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    HashSketchUtil.minhashBandKeys(v.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HashSketchUtil.minhashBandKeys($c, $k, $bands);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** `SimHash64(text)` -> 64-bit token-set fingerprint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"argument must be string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    HashSketchUtil.simhash64(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one 64-slot scratch array per operator instance, not per row
    val scratch = ctx.addMutableState("int[]", "simhashCounts",
      v => s"$v = new int[64];")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashSketchUtil.simhash64($c, $scratch);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object HashSketches {
  /** Column API: LSH band keys of a distinct-shingle array column. */
  def minhashBandKeys(shingles: Column, k: Int = 128, bands: Int = 32): Column =
    GraftSqlBridge.column(MinHashBandKeys(GraftSqlBridge.expression(shingles), k, bands))

  /** Column API: 64-bit SimHash of a text column's token set. */
  def simhash64(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text)))
}
