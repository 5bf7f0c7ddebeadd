package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The codegen DotProduct must be bit-identical to the
  * aggregate/zip_with fold it replaces (which DuckDB's
  * list_dot_product also matches). */
class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val hofDot =
    expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  test("bit-identical to the higher-order-function fold on real embeddings") {
    val emb = Tables.t(spark, sf, "embeddings")
      .withColumn("a", col("embedding").cast(ArrayType(DoubleType)))
    val pairs = emb.select(col("vec_id"), col("a"))
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0).select(col("a").as("b"))))
    val diff = pairs
      .withColumn("fast", VectorOps.dot(col("a"), col("b")))
      .withColumn("slow", hofDot)
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("interpreted path agrees with codegen path") {
    val df = Seq((Seq(1.5, -2.0, 3.25), Seq(2.0, 0.5, -1.0))).toDF("a", "b")
    val expect = 1.5 * 2.0 + -2.0 * 0.5 + 3.25 * -1.0
    assert(df.select(VectorOps.dot(col("a"), col("b"))).collect()(0).getDouble(0) == expect)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.select(VectorOps.dot(col("a"), col("b"))).collect()(0).getDouble(0) == expect)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null array yields null; null elements count as zero") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(VectorOps.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
    val df2 = Seq((Seq(Some(1.0), None, Some(3.0)), Seq(Some(2.0), Some(5.0), Some(1.0))))
      .toDF("a", "b")
    assert(df2.select(VectorOps.dot(col("a"), col("b"))).collect()(0).getDouble(0) == 1.0 * 2.0 + 3.0 * 1.0)
  }

  test("intDot: equals the HOF fold on quantized embeddings, handles nulls, " +
    "and survives the full int8 range") {
    val emb = Tables.t(spark, sf, "embeddings")
      .withColumn("e", col("embedding").cast(ArrayType(DoubleType)))
    val q = graft.operators.Similarity.sq8Table(emb, "vec_id", "e")
    val pairs = q.crossJoin(broadcast(
      q.filter(col("vec_id") === 0).select(col("q").as("p"))))
    val diff = pairs
      .withColumn("fast", VectorOps.intDot(col("q"), col("p")))
      .withColumn("slow", expr(
        "aggregate(zip_with(q, p, (x, y) -> CAST(x AS INT) * CAST(y AS INT)), 0L, (a, v) -> a + v)"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
    // extremes: (-128)^2 * n accumulates exactly in the long
    val ext = Seq((Seq.fill(64)(-128.toByte), Seq.fill(64)(-128.toByte))).toDF("a", "b")
    assert(ext.select(VectorOps.intDot(col("a"), col("b")))
      .collect()(0).getLong(0) === 64L * 128 * 128)
    val nulls = Seq((Some(Seq(1.toByte, 2.toByte)), Option.empty[Seq[Byte]])).toDF("a", "b")
    assert(nulls.select(VectorOps.intDot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }
}
