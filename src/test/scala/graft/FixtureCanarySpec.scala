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

  test("canary: every load-bearing column of every table survives regeneration (name + type family)") {
    // Family-level pin for ALL 10 tables (VERDICT r10 item 5): a
    // regeneration that renames a column or flips its type family
    // (string->binary, numeric->string, timestamp dropped) must fail
    // HERE with a table/column message, not as a scattered
    // AnalysisException mid-registry. Families — not exact types — so
    // benign width drift (int32<->int64, float<->double) stays green;
    // the queries all cast at use sites.
    sealed trait Fam { def ok(dt: DataType): Boolean }
    case object I extends Fam { // integral
      def ok(dt: DataType) = Seq(ByteType, ShortType, IntegerType, LongType).contains(dt)
    }
    case object F extends Fam { // fractional (or integral widened by a regen)
      def ok(dt: DataType) = dt.isInstanceOf[NumericType]
    }
    case object S extends Fam { def ok(dt: DataType) = dt == StringType }
    case object T extends Fam { // event-time axis: timestamp or date
      def ok(dt: DataType) = dt == TimestampType || dt == TimestampNTZType || dt == DateType
    }
    case object VEC extends Fam { // embedding vector
      def ok(dt: DataType) = dt match {
        case ArrayType(e, _) => e.isInstanceOf[NumericType]
        case _ => false
      }
    }
    val expected: Map[String, Seq[(String, Fam)]] = Map(
      "region" -> Seq("r_regionkey" -> I, "r_name" -> S),
      "nation" -> Seq("n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I),
      "customer" -> Seq("c_custkey" -> I, "c_name" -> S, "c_nationkey" -> I,
        "c_acctbal" -> F, "c_mktsegment" -> S),
      "supplier" -> Seq("s_suppkey" -> I, "s_name" -> S, "s_nationkey" -> I,
        "s_acctbal" -> F),
      "part" -> Seq("p_partkey" -> I, "p_name" -> S, "p_brand" -> S,
        "p_type" -> S, "p_size" -> I, "p_retailprice" -> F),
      "orders" -> Seq("o_orderkey" -> I, "o_custkey" -> I, "o_orderstatus" -> S,
        "o_totalprice" -> F, "o_orderdate" -> T, "o_orderpriority" -> S),
      "lineitem" -> Seq("l_orderkey" -> I, "l_partkey" -> I, "l_suppkey" -> I,
        "l_linenumber" -> I, "l_quantity" -> F, "l_extendedprice" -> F,
        "l_discount" -> F, "l_tax" -> F, "l_returnflag" -> S,
        "l_linestatus" -> S, "l_shipdate" -> T),
      "events" -> Seq("event_id" -> I, "ts" -> T, "user_id" -> I,
        "event_type" -> S, "value" -> F, "props" -> S),
      "documents" -> Seq("doc_id" -> I, "text" -> S, "lang" -> S,
        "source" -> S, "n_chars" -> I),
      "embeddings" -> Seq("vec_id" -> I, "embedding" -> VEC, "label" -> I))
    assert(expected.keySet == Tables.all.toSet,
      s"canary table list drifted from Tables.all: ${Tables.all.mkString(",")}")
    expected.foreach { case (table, cols) =>
      val schema = Tables.t(spark, sf, table).schema
      cols.foreach { case (name, fam) =>
        val field = schema.find(_.name == name)
        assert(field.isDefined,
          s"$table.$name missing after regeneration — present: ${schema.fieldNames.mkString(",")}")
        assert(fam.ok(field.get.dataType),
          s"$table.$name type family drifted: got ${field.get.dataType} — " +
            "audit the queries that read it, then update this canary")
      }
    }
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
