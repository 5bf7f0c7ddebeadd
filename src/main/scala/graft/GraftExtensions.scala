package graft

import graft.functions.{ArrayCountLess, DotProduct, FreqSketch, MinHashBandKeys, RollingHashFingerprint, SimHash64, TopKPairs, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: registers graft's native
 * expressions as SQL functions, so `spark.sql` users get them too:
 *
 *   SELECT dot_product(a, b), fingerprint(text),
 *          word_shingles(text, 3), simhash64(text),
 *          minhash_band_keys(word_shingles(text, 3), 128, 32) FROM ...
 *
 * Wire up with:
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 * or config: spark.sql.extensions=graft.GraftExtensions
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  /** The injected (identifier, info, builder) triples — exposed so the
    * builder lambdas (arity checks, literal coercion, argument order)
    * are directly testable against a function registry. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("fingerprint"),
      new ExpressionInfo(classOf[RollingHashFingerprint].getName, "fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "fingerprint(str) takes one argument")
        RollingHashFingerprint(args.head)
      }),
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args(0), args(1))
      }),
    (new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(text, n) takes two arguments")
        WordShingles(args.head, intArg(args(1), "n"))
      }),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(text) takes one argument")
        SimHash64(args.head)
      }),
    (new FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "minhash_band_keys"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_band_keys(shingles, k, bands) takes three arguments")
        MinHashBandKeys(args.head, intArg(args(1), "k"), intArg(args(2), "bands"))
      }),
    (new FunctionIdentifier("array_count_less"),
      new ExpressionInfo(classOf[ArrayCountLess].getName, "array_count_less"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_count_less(arr, v) takes two arguments")
        ArrayCountLess(args.head, args(1))
      }),
    // aggregate: the registry wraps a bare AggregateFunction in an
    // AggregateExpression during analysis, same as built-in collect_list
    (new FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "topk_pairs(value, payload, k) takes three arguments")
        TopKPairs(args.head, args(1), intArg(args(2), "k"))
      }),
    (new FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "freq_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "freq_sketch(key, k) takes two arguments")
        FreqSketch(args.head, intArg(args(1), "k"))
      }))

  /** Sketch geometry must be fixed at plan time (it defines the
    * signature layout) — accept only foldable integral arguments. */
  private[graft] def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval(null) match {
      case i: Int => i
      case l: Long => java.lang.Math.toIntExact(l) // reject out-of-range, don't truncate
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(s"$what must be integral, got $other")
    }
  }
}
