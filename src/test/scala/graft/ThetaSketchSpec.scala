package graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches}
import graft.functions.ThetaSketchAgg
import org.apache.spark.sql.functions._

/** Theta-sketch aggregate: exactness below nominal capacity, set
  * algebra on the resulting binaries, and partial-merge equivalence
  * (the property the map-side combine relies on). */
class ThetaSketchSpec extends SparkTestBase {

  private def heapify(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  test("below 2^lgK the sketch estimate IS the exact distinct count") {
    import spark.implicits._
    // 3000 distinct keys, lgK=12 (4096 nominal) — exact mode
    val df = (0L until 9000L).map(i => i % 3000L).toDF("k")
    val bytes = df.agg(ThetaSketchAgg.sketch(col("k"), 12).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    assert(heapify(bytes).getEstimate == 3000.0)
  }

  test("repartitioned (forced partial-merge) sketch equals single-partition sketch") {
    import spark.implicits._
    val df = (0L until 5000L).toDF("k")
    def est(parts: Int): Double = heapify(
      df.repartition(parts).agg(ThetaSketchAgg.sketch(col("k"), 12).as("sk"))
        .collect()(0).getAs[Array[Byte]]("sk")).getEstimate
    assert(est(1) == est(13))
  }

  test("driver-side intersection of group sketches equals exact overlap") {
    import spark.implicits._
    // group a: 0..1999, group b: 1000..2999 -> overlap 1000..1999 = 1000
    val df = (0L until 2000L).map(("a", _)).toDF("g", "k")
      .union((1000L until 3000L).map(("b", _)).toDF("g", "k"))
    val sk = df.groupBy("g").agg(ThetaSketchAgg.sketch(col("k"), 12).as("sk"))
      .collect().map(r => r.getString(0) -> heapify(r.getAs[Array[Byte]]("sk"))).toMap
    val it = SetOperation.builder().setLogNominalEntries(12).buildIntersection()
    it.intersect(sk("a"))
    it.intersect(sk("b"))
    assert(it.getResult().getEstimate == 1000.0)
    assert(sk("a").getEstimate == 2000.0 && sk("b").getEstimate == 2000.0)
  }

  test("plans through ObjectHashAggregateExec (map-side partial sketches)") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i % 3, i)).toDF("g", "k")
      .groupBy("g").agg(ThetaSketchAgg.sketch(col("k"), 12).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
  }

  test("nulls are ignored, all-null group yields the empty sketch") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(2L), None).toDF("k")
    val bytes = df.agg(ThetaSketchAgg.sketch(col("k"), 12).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    assert(heapify(bytes).getEstimate == 2.0)
    val empty = df.filter(col("k").isNull)
      .agg(ThetaSketchAgg.sketch(col("k"), 12).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    assert(heapify(empty).getEstimate == 0.0)
  }
}
