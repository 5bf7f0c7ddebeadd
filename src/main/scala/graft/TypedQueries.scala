package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Typed Dataset tier: case-class rows + a custom typed Aggregator —
 * the compile-time-checked face of the same engine. The Aggregator
 * accumulates in BigDecimal (exact, order-independent), so the result
 * is oracle-comparable like the Column-based decimal sums.
 */
object TypedQueries {

  final case class Line(l_returnflag: String, l_linestatus: String,
                        l_quantity: Double, l_extendedprice: Double)

  /** Exact decimal sum of (quantity) as a reusable typed Aggregator. */
  object QtySum extends Aggregator[Line, java.math.BigDecimal, Double] {
    private val two = java.math.RoundingMode.HALF_UP
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, l: Line): java.math.BigDecimal =
      b.add(new java.math.BigDecimal(l.l_quantity).setScale(2, two))
    override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
      a.add(b)
    override def finish(r: java.math.BigDecimal): Double = r.doubleValue()
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  object LineCount extends Aggregator[Line, Long, Long] {
    override def zero = 0L
    override def reduce(b: Long, l: Line): Long = b + 1
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  val all: Seq[Q] = Seq(
    Q("typed_agg",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
          .as[Line]
          .groupByKey(l => (l.l_returnflag, l.l_linestatus))
          .agg(QtySum.toColumn.name("sum_qty"), LineCount.toColumn.name("n"))
          .select(col("key._1").as("l_returnflag"), col("key._2").as("l_linestatus"),
            col("sum_qty"), col("n"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |COUNT(*) AS n
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- typed flatMapGroups: the per-group imperative escape hatch
    //      for state machines window frames can't express — here they
    //      CAN, which is the point: the oracle is the LAG rewrite, so
    //      the typed path is pinned to reproduce the declarative one
    //      exactly. Each customer's orders sort IN MEMORY per group
    //      (group-sized, bounded per key at any corpus scale — the
    //      shuffle is the same keyed exchange a window would pay) and
    //      emit the seconds-gap to the previous order. ----
    Q("typed_order_gaps",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .filter(col("o_custkey") % 10 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"))
          .as[OrderRow]
          .groupByKey(_.o_custkey)
          .flatMapGroups { (k: Long, rows: Iterator[OrderRow]) =>
            val sorted = rows.toIndexedSeq.sortBy(r => (r.epoch_s, r.o_orderkey))
            sorted.iterator.zipWithIndex.map { case (r, i) =>
              OrderGap(k, r.o_orderkey,
                if (i == 0) -1L else r.epoch_s - sorted(i - 1).epoch_s)
            }
          }
          .toDF()
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderkey,
             |  epoch(CAST(o_orderdate AS TIMESTAMP)) AS e
             |  FROM orders WHERE o_custkey % 10 = 0)
             |SELECT o_custkey, o_orderkey,
             |  COALESCE(CAST(e - LAG(e) OVER (PARTITION BY o_custkey ORDER BY e, o_orderkey) AS BIGINT), -1) AS gap_s
             |FROM o ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- typed flatMapGroups SESSIONIZATION: the imperative
    //      state-machine form of events_sessionize (which rides the
    //      declarative session_window) — pinned against the SAME
    //      gaps-and-islands oracle, so the typed escape hatch is
    //      proven to reproduce the engine operator exactly, gap
    //      convention included (a 10-minute-or-more silence opens a
    //      new session). Each user's events sort IN MEMORY per group
    //      — bounded by per-user activity at any corpus scale, and
    //      the shuffle is the same user-keyed exchange session_window
    //      pays. Timestamps ride exact epoch MICROS end to end. ----
    Q("typed_sessionize_mapgroups",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"))
          .as[EventRow]
          .groupByKey(_.user_id)
          .flatMapGroups { (k: Long, rows: Iterator[EventRow]) =>
            val sorted = rows.toIndexedSeq.sortBy(r => (r.us, r.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[TypedSession]
            var start = sorted.head.us
            var end = sorted.head.us
            var n = 0L
            sorted.foreach { r =>
              if (n > 0L && r.us - end >= 600000000L) {
                out += TypedSession(k, start, end, n)
                start = r.us; n = 0L
              }
              end = r.us; n += 1
            }
            out += TypedSession(k, start, end, n)
            out.iterator
          }
          .toDF()
          .orderBy("user_id", "start_us")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
             |flags AS (SELECT user_id, us,
             |  CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) >= 600000000
             |       OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
             |       THEN 1 ELSE 0 END AS new_s FROM e),
             |sess AS (SELECT user_id, us,
             |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM flags)
             |SELECT user_id, CAST(MIN(us) AS BIGINT) AS start_us,
             |  CAST(MAX(us) AS BIGINT) AS end_us, COUNT(*) AS n_events
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, start_us""".stripMargin)),

    // ---- typed MULTI-FIELD Aggregator: one pass, one buffer case
    //      class (count, exact cents sum via BigDecimal quantization,
    //      max) — the compile-time face of the agg_moments family.
    //      Cents come from BigDecimal.setScale(2, HALF_UP) on the
    //      double (the same HALF_UP contract as Spark's round() and
    //      DuckDB's round(), so the oracle is exact). Merge is
    //      field-wise and order-independent — the Aggregator law that
    //      makes it safe under any partitioning. ----
    Q("typed_customer_stats",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .select("o_custkey", "o_totalprice")
          .as[CustOrder]
          .groupByKey(_.o_custkey)
          .agg(CustStats.toColumn.name("st"))
          .select(col("key").as("o_custkey"),
            col("st.n").as("n_orders"),
            col("st.sum_cents").as("sum_cents"),
            col("st.max_cents").as("max_cents"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  final case class CustOrder(o_custkey: Long, o_totalprice: Double)
  final case class CustBuf(n: Long, sum_cents: Long, max_cents: Long)

  /** Multi-field typed Aggregator over orders: (count, exact cents
    * sum, max) in one buffer. Cents quantize through BigDecimal
    * HALF_UP — the same rounding contract as SQL round() on both
    * engines, so typed and Column results agree bit-exactly. */
  object CustStats extends Aggregator[CustOrder, CustBuf, CustBuf] {
    private def cents(p: Double): Long =
      new java.math.BigDecimal(p)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()
    override def zero: CustBuf = CustBuf(0L, 0L, Long.MinValue)
    override def reduce(b: CustBuf, o: CustOrder): CustBuf = {
      val c = cents(o.o_totalprice)
      CustBuf(b.n + 1, b.sum_cents + c, math.max(b.max_cents, c))
    }
    override def merge(a: CustBuf, b: CustBuf): CustBuf =
      CustBuf(a.n + b.n, a.sum_cents + b.sum_cents,
        math.max(a.max_cents, b.max_cents))
    override def finish(r: CustBuf): CustBuf = r
    override def bufferEncoder: Encoder[CustBuf] = Encoders.product[CustBuf]
    override def outputEncoder: Encoder[CustBuf] = Encoders.product[CustBuf]
  }

  final case class OrderRow(o_custkey: Long, o_orderkey: Long, epoch_s: Long)
  final case class OrderGap(o_custkey: Long, o_orderkey: Long, gap_s: Long)
  final case class EventRow(user_id: Long, us: Long, event_id: Long)
  final case class TypedSession(user_id: Long, start_us: Long, end_us: Long,
                                n_events: Long)
}
