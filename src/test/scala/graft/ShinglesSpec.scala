package graft

import graft.functions.Shingles
import org.apache.spark.sql.functions._

/** The compiled WordShingles kernel must agree cell-for-cell with the
  * HOF pipeline it replaced (the MinHash/Jaccard oracle parity rests
  * on that equivalence), on both the codegen and interpreted paths. */
class ShinglesSpec extends SparkTestBase {
  import spark.implicits._

  /** The original SQL formulation: split on ' ' (empties kept),
    * transform over positions, concat_ws join, array_distinct. */
  private def hofShingles(n: Int) = expr(
    s"CASE WHEN size(split(t, ' ')) >= $n THEN " +
      s"array_distinct(transform(sequence(1, size(split(t, ' ')) - ${n - 1}), " +
      s"i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(split(t, ' '), i + $j)").mkString(", ")}))) " +
      s"ELSE array() END")

  private val samples = Seq(
    "",                          // empty -> no shingles
    "one two",                   // fewer than 3 words
    "a b c",                     // exactly one shingle
    "a b c d e f g",             // plain run
    "a  b c",                    // consecutive spaces -> empty token kept
    " lead and trail ",          // boundary empties
    "x y z x y z x y z",         // repeated shingles -> distinct
    "unicode é 中 文 tokens here",
    Seq.fill(300)("w").mkString(" ")) // one distinct shingle, long doc

  private def compare(n: Int): Unit = {
    val rows = samples.toDF("t")
      .select(col("t"),
        Shingles.wordShingles(col("t"), n).as("got"),
        hofShingles(n).as("want"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"n=$n mismatch for '${r.getString(0).take(30)}'")
    }
  }

  test("codegen path matches the HOF pipeline for n=2,3,5") {
    Seq(2, 3, 5).foreach(compare)
  }

  test("interpreted (no-codegen) path agrees") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try compare(3)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null text propagates to null") {
    val r = Seq[String](null).toDF("t")
      .select(Shingles.wordShingles(col("t"), 3)).collect()
    assert(r(0).isNullAt(0))
  }
}
