package graft

import org.apache.spark.sql.types._

/**
 * Fixture-drift canary (VERDICT r9 item 2). The driver regenerates
 * /root/testdata between rounds; round 9 proved a silent schema drift
 * (events.ts nanos-int64 -> timestamp[us]) can knock out a whole
 * query family when a reader pins the physical type. This spec fails
 * LOUDLY on the next regeneration: every table in Tables.all must
 * load, and the events adapter must land `ts` as a timestamp type
 * whatever vintage the footer carries.
 */
class FixtureCanarySpec extends SparkTestBase {

  test("canary: every fixture table loads with rows > 0") {
    Tables.all.foreach { name =>
      val df = Tables.t(spark, sf, name)
      assert(df.limit(1).count() == 1, s"table $name is empty or unreadable")
    }
  }

  test("canary: events.ts lands as TimestampType after the adapter") {
    val events = Tables.t(spark, sf, "events")
    assert(events.schema("ts").dataType == TimestampType,
      s"events.ts adapter produced ${events.schema("ts").dataType}; " +
        "extend Tables.normalizeEventTs for the new fixture vintage")
    // sanity: the values are modern wall-clock, not a collapsed 1970
    // feed (the round-9 silent failure mode: micros read as raw longs
    // then div-1000 -> everything lands in Jan 1970)
    val maxYear = events
      .selectExpr("max(year(ts)) AS y").head().getInt(0)
    assert(maxYear >= 2000, s"events.ts max year $maxYear — timestamps collapsed")
  }

  test("canary: embedding dimension matches the ANN queries' pinned dim=64") {
    import org.apache.spark.sql.functions._
    val d = Tables.t(spark, sf, "embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    assert(d == 64,
      s"embeddings regenerated at dim $d — update the dim = 64 call sites in " +
        "SimilarityQueries (annTopK/pq*/ivf*/embeddingNearDups) and their " +
        "m-subquantizer choices (dim % m must stay 0)")
  }

  test("canary: normalizeEventTs handles all three vintages") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq((1L, 1755100000000000L)).toDF("event_id", "ts")
    // long vintage = nanos
    val fromNanos = Tables.normalizeEventTs(
      base.withColumn("ts", col("ts") * 1000L))
    // ntz vintage = micros wall clock
    val fromNtz = Tables.normalizeEventTs(
      base.withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType)))
    // already-instant vintage
    val fromTs = Tables.normalizeEventTs(
      base.withColumn("ts", timestamp_micros(col("ts"))))
    val vals = Seq(fromNanos, fromNtz, fromTs).map { df =>
      assert(df.schema("ts").dataType == TimestampType)
      df.select(unix_micros(col("ts"))).head().getLong(0)
    }
    assert(vals.distinct == Seq(1755100000000000L),
      s"vintages disagree after normalization: $vals")
  }
}
