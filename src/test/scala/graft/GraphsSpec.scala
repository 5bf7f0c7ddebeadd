package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

/** Full k-core fixpoint vs an in-memory brute-force peel — the loop
  * half of the split the gate's one-step `graph_kcore_peel` oracle
  * cannot state (iterated deletion has no WITH RECURSIVE form). */
class GraphsSpec extends SparkTestBase {

  private def bruteKCore(edges: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var cur = edges
    var changed = true
    while (changed) {
      val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = cur.filter(e => keep(e._1) && keep(e._2))
      changed = next != cur
      cur = next
    }
    cur
  }

  test("kCore equals brute-force peeling, including a diameter-deep fringe") {
    import spark.implicits._
    // 5-clique (the 4-core) + a path fringe hanging off node 0 that
    // peels one layer per round at k=2, + an isolated 3-cycle
    val clique = for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)
    val path = (0L until 6L).map(i => (if (i == 0) 0L else 100L + i - 1, 100L + i))
    val cycle = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val edges = (clique ++ path ++ cycle).toSet
    val df = edges.toSeq.toDF("u", "v")
    for (k <- Seq(2, 3, 4, 5)) {
      val got = Graphs.kCore(df, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == bruteKCore(edges, k), s"k=$k")
    }
  }

  test("reachSketch: 1- and 2-hop ball estimates equal brute-force BFS ball sizes") {
    import spark.implicits._
    // same fixture as kCore: a 5-clique, a path fringe, a 3-cycle —
    // mixes dense balls, chain growth, and a small component. At
    // these ball sizes the HLL sketch is coupon-exact, so the
    // estimate must EQUAL the true ball size (self included).
    val clique = for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)
    val path = (0L until 6L).map(i => (if (i == 0) 0L else 100L + i - 1, 100L + i))
    val cycle = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val edges = (clique ++ path ++ cycle).toSet
    val adj: Map[Long, Set[Long]] = (edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    def ball(seed: Long, hops: Int): Set[Long] =
      (1 to hops).foldLeft(Set(seed))((b, _) => b ++ b.flatMap(adj.getOrElse(_, Set.empty)))
    val sym = Graphs.symmetric(edges.toSeq.toDF("u", "v"))
    for (hops <- Seq(1, 2)) {
      val got = Graphs.reachSketch(sym, hops)
        .select(col("node"), expr("hll_sketch_estimate(sk)").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = adj.keySet.map(n => n -> ball(n, hops).size.toLong).toMap
      assert(got == want, s"hops=$hops: ${got.toSeq.sorted} vs ${want.toSeq.sorted}")
    }
  }

  test("peel: one step only removes the current fringe; degrees count both sides") {
    import spark.implicits._
    val df = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val deg = Graphs.degrees(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // k=2 peel removes endpoints 1 and 4 -> only (2,3) survives round 1
    val once = Graphs.peel(df, 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once == Set((2L, 3L)))
    // fixpoint is empty (path has no 2-core)
    assert(Graphs.kCore(df, 2).count() == 0)
  }

  private def bruteCoreNumbers(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set()) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set()) += u
    }
    val rem = scala.collection.mutable.Map(adj.toSeq.map { case (n, a) => n -> a.size }: _*)
    val alive = scala.collection.mutable.Set(adj.keys.toSeq: _*)
    val core = scala.collection.mutable.Map[Long, Long]()
    while (alive.nonEmpty) {
      val k = alive.iterator.map(rem).min
      val todo = scala.collection.mutable.Queue(alive.filter(rem(_) <= k).toSeq: _*)
      while (todo.nonEmpty) {
        val n = todo.dequeue()
        if (alive(n)) {
          core(n) = k.toLong; alive -= n
          adj(n).foreach { m =>
            if (alive(m)) { rem(m) -= 1; if (rem(m) <= k) todo += m }
          }
        }
      }
    }
    core.toMap
  }

  test("bfsHops: minimal distances from a multi-source seed set; cap excludes the far tail") {
    import spark.implicits._
    // path 0-1-2-3-4-5 plus a branch 2-10-11; seeds {0, 11}
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (2L, 10L), (10L, 11L)).toDF("u", "v")
    val seeds = Seq(0L, 11L).toDF("node")
    val got = Graphs.bfsHops(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 2 is 2 hops from 0 and 2 from 11 — min wins either way;
    // node 10 is 1 from 11 (not 3 via 0's side)
    assert(got == Map(0L -> 0L, 11L -> 0L, 1L -> 1L, 10L -> 1L,
      2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
    // a maxHops cap strictly excludes nodes beyond it
    val capped = Graphs.bfsHops(edges, Seq(0L).toDF("node"), maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("coreNumbers: h-index fixpoint equals brute-force min-degree peeling") {
    import spark.implicits._
    // 5-clique (core 4) + a path fringe off node 0 (core 1) + a
    // 3-cycle (core 2) + a 4-clique bridged to the 5-clique by one
    // edge (bridge endpoints keep their own cliques' core numbers)
    val clique5 = for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)
    val path = (0L until 4L).map(i => (if (i == 0) 0L else 100L + i - 1, 100L + i))
    val cycle = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val clique4 = for (i <- 300L to 303L; j <- i + 1 to 303L) yield (i, j)
    val bridge = Seq((4L, 300L))
    val edges = (clique5 ++ path ++ cycle ++ clique4 ++ bridge).toSet
    val got = Graphs.coreNumbers(edges.toSeq.toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteCoreNumbers(edges))
  }

  test("triangleCount: wedge-join fallback (forced tiny gate) equals the broadcast form") {
    import spark.implicits._
    // 5-clique (C(5,3)=10 triangles) + a 4-cycle (0 triangles) + a
    // pendant edge; orient by (degree, id) pack exactly as the gate
    // query does so both strategies see the same compact-forward graph
    val clique = for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)
    val square = Seq((10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L))
    val edges = (clique ++ square ++ Seq((0L, 20L))).toDF("u", "v")
    val deg = Graphs.degrees(edges)
    val ranked = edges
      .join(deg.select(col("node").as("u"), (col("deg") * 10000000000L + col("u")).as("ru")), "u")
      .join(deg.select(col("node").as("v"), (col("deg") * 10000000000L + col("v")).as("rv")), "v")
    val oriented = ranked.select(
      when(col("ru") < col("rv"),
        struct(col("u").as("s"), col("v").as("t"), col("rv").as("rt")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"), col("ru").as("rt"))).as("o"))
      .select(col("o.s").as("s"), col("o.t").as("t"), col("o.rt").as("rt"))
    val n = oriented.count()
    val viaBroadcast = Graphs.triangleCount(oriented, n).collect()(0).getLong(0)
    val viaWedges = Graphs.triangleCount(oriented, n, broadcastMaxEdges = 0L)
      .collect()(0).getLong(0)
    assert(viaBroadcast == 10L)
    assert(viaWedges == viaBroadcast,
      "size-gated fallback must count the same triangles")
  }

  test("ancestorRollup: deep chain sums every descendant; a cycle fails loudly") {
    import spark.implicits._
    // chain 1 <- 2 <- 3 <- 4 plus a second child 5 of node 1
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (5L, 1L)).toDF("child", "parent")
    val contrib = Seq((1L, 10L), (2L, 1L), (3L, 2L), (4L, 4L), (5L, 8L)).toDF("node", "w")
    val got = Graphs.ancestorRollup(edges, contrib).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 25L, 2L -> 7L, 3L -> 6L, 4L -> 4L, 5L -> 8L))
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("child", "parent")
    val e = intercept[IllegalArgumentException] {
      Graphs.ancestorRollup(cyc, Seq((1L, 1L)).toDF("node", "w"), maxIters = 5)
    }
    assert(e.getMessage.contains("cyclic"))
  }

  test("harmonic2 on a hand path graph: exact distance-1/2 counts") {
    import spark.implicits._
    // path 1-2-3-4: n1 = deg, n2 = nodes exactly 2 away
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = graft.operators.Graphs.harmonic2(graft.operators.Graphs.symmetric(e))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((1L, 1L, 1500L))) // nbr {2}, dist2 {3}
    assert(got(2L) === ((2L, 1L, 2500L))) // nbrs {1,3}, dist2 {4}
    assert(got(3L) === ((2L, 1L, 2500L)))
    assert(got(4L) === ((1L, 1L, 1500L)))
  }

  test("pageRank fixpoint: symmetric pair converges to the analytic rank; sinks keep base") {
    import spark.implicits._
    // two-node symmetric pair: r = 150000 + 850*r/1000 -> r = 1e6
    val pair = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = graft.operators.Graphs.pageRank(pair, tolMicros = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(pr(1L) - 1000000L) <= 40, s"got ${pr(1L)}")
    assert(pr(1L) === pr(2L))
    // sink-drop: 3 -> 4 only; 4 emits nothing and settles at
    // base + damped share of 3's (shrinking) rank; 3 receives
    // nothing and settles at exactly base
    val chain = Seq((3L, 4L)).toDF("src", "dst")
    val pr2 = graft.operators.Graphs.pageRank(chain, tolMicros = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr2(3L) === 150000L)
    assert(pr2(4L) === 150000L + (850L * 150000L) / 1000L)
  }

  test("stationaryFixpoint: two-state chain converges to the exact stationary ratio") {
    import spark.implicits._
    // P = [[0, 1], [1, 0]] alternator is periodic — use a lazy chain:
    // A: 3/4 stay, 1/4 to B; B: 1/2 stay, 1/2 to A -> pi = (2/3, 1/3)
    val tr = Seq(("A", "A", 3L), ("A", "B", 1L), ("B", "B", 1L), ("B", "A", 1L))
      .toDF("src", "dst", "n")
    val pi = graft.operators.Graphs.stationaryFixpoint(tr, tolMicros = 50L, maxIters = 40)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-state init 1e6, total mass 2e6 -> pi(A) ~ 4/3e6, pi(B) ~ 2/3e6
    assert(math.abs(pi("A") - 1333333L) <= 300, s"got ${pi("A")}")
    assert(math.abs(pi("B") - 666667L) <= 300, s"got ${pi("B")}")
  }

  test("personalizedPageRank: mass concentrates near the seed") {
    import spark.implicits._
    // path 1-2-3-4-5 symmetric, seed {1}. NOTE per-node rank is not
    // monotone in distance (the degree-1 seed ships its WHOLE rank to
    // node 2 each round, which returns only half), so the assertions
    // are the ones that ARE theorems here: rank decays strictly
    // beyond the seed's neighbor, the seed outranks everything at
    // distance >= 2, and the seed half of the path holds most mass
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val sym = graft.operators.Graphs.symmetric(e)
      .select(col("u").as("src"), col("v").as("dst"))
    val seeds = Seq(1L).toDF("node")
    val pr = graft.operators.Graphs.personalizedPageRank(sym, seeds, tolMicros = 5000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(2L) > pr(3L) && pr(3L) > pr(4L) && pr(4L) > pr(5L),
      s"rank must decay beyond the seed's neighbor: $pr")
    assert(pr(1L) > pr(3L), s"seed must outrank distance-2 nodes: $pr")
    assert(pr(1L) + pr(2L) > pr(3L) + pr(4L) + pr(5L),
      s"mass must concentrate on the seed half: $pr")
  }
}
