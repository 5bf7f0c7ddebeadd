package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed primitives over an undirected edge list `(u, v)` with
 * u < v — the graph tier next to the connected-components labeller in
 * [[Dedup.clusters]] and the triangle counter on the gate
 * (`orders_triangle_count`). Everything here is join/aggregate-shaped:
 * degrees are one symmetric groupBy, a peel is a semi-join, and the
 * k-core loop's per-round driver traffic is a single row count.
 */
object Graphs {

  /** Both directions of the undirected edge list. */
  def symmetric(edges: DataFrame): DataFrame =
    edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))

  /** (node, deg) — nodes with at least one edge. */
  def degrees(edges: DataFrame): DataFrame =
    symmetric(edges).groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("deg"))

  /**
   * ONE k-core peel step: drop every node of degree < k and return
   * the induced edge set. One degree aggregation + two semi-joins —
   * the fan-out never exceeds the edge list.
   */
  def peel(edges: DataFrame, k: Int): DataFrame = {
    val keep = degrees(edges).filter(col("deg") >= k).select("node")
    edges
      .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
      .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      .select("u", "v") // using-column joins reorder; keep the contract
  }

  /**
   * Full k-core: the maximal subgraph where every node has degree
   * >= k, by iterated peeling to a fixpoint. Each round is one
   * degree aggregation + two semi-joins over the SHRINKING edge set,
   * `localCheckpoint` truncates lineage, and the per-round driver
   * scalar is an edge count. Iteration count is the peeling depth —
   * small on clustered graphs (each round removes whole fringes),
   * but inherently O(n) on an adversarial path graph at k = 2 (one
   * endpoint pair per round); distributed k-core has no better
   * worst-case round bound, so size `maxIters` to the expected
   * fringe depth, not the node count. On a multi-executor cluster
   * prefer `checkpoint()` with a checkpoint dir if executor loss
   * mid-loop must be survivable.
   */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 50): DataFrame = {
    var cur = edges.select("u", "v").localCheckpoint()
    var n = cur.count()
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      val next = peel(cur, k).localCheckpoint()
      val m = next.count()
      done = m == n
      cur = next
      n = m
      it += 1
    }
    require(done, s"k-core peeling did not converge in $maxIters iterations")
    cur
  }

  /**
   * ANCESTOR ROLLUP: aggregate per-node contributions up a parent
   * hierarchy — each node's result is the sum of `w` over itself and
   * every descendant (BOM explosion, org-chart rollup, category-tree
   * revenue). `edges` is the parent relation `(child, parent)`;
   * `contrib` is `(node, w)`.
   *
   * The fact-sized work happens BEFORE this call (aggregate facts to
   * per-node contributions once); the closure then iterates over
   * dimension-scale data: each round joins the shrinking frontier to
   * the edge table and re-aims contributions at the parent, so total
   * rows processed are Σ_nodes depth(node) — the transitive-closure
   * size, reached in depth rounds with a row-count-only driver
   * scalar per round. `localCheckpoint` truncates lineage. Cycles in
   * `edges` would never drain the frontier: the `maxIters` require
   * fires rather than looping silently.
   */
  def ancestorRollup(edges: DataFrame, contrib: DataFrame,
                     maxIters: Int = 30): DataFrame = {
    val e = edges.select(col("child"), col("parent"))
    var acc = contrib.select(col("node"), col("w"))
    var frontier = acc.localCheckpoint()
    var it = 0
    while (frontier.limit(1).count() > 0 && it < maxIters) {
      frontier = frontier
        .join(e, frontier("node") === e("child"))
        .select(col("parent").as("node"), col("w"))
        .localCheckpoint()
      acc = acc.union(frontier)
      it += 1
    }
    require(it < maxIters || frontier.limit(1).count() == 0,
      s"hierarchy deeper than $maxIters levels (or cyclic)")
    acc.groupBy("node").agg(sum("w").as("subtree_w"))
  }
}
