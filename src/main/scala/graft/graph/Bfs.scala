package graft.graph

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Iterative k-hop breadth-first search over an edge list.
  *
  * Each round joins the CURRENT FRONTIER (small) against the edge list
  * and anti-joins the visited set, so min-hop labels fall out of BFS
  * order with no path explosion — unlike a naive transitive closure,
  * work per round is O(frontier·degree), not O(paths).
  *
  * Scale contract: the anti-join's visited side is broadcast ONLY while
  * its row count (already paid for by the per-round convergence
  * `count()`) stays under `broadcastLimit`; past that the hint is
  * dropped and both joins shuffle on the node key — on a 100× graph
  * whose reach is millions of nodes, a hard-coded broadcast would be a
  * driver OOM. Driver state per round is the one bounded count (the
  * KMeans/PageRank convergence contract).
  */
object Bfs {

  /** Min-hop labels `(node, hop)` for every node within `hops` of
    * `seed`, over a BIDIRECTIONAL edge list `bidir(a, b)` (undirected
    * graphs must pass both orientations). The returned frame is
    * persisted; callers unpersist after consuming.
    */
  /** Per-round observer: (hop, visitedCountBeforeRound, usedBroadcast).
    * Lets the scale harness assert the fallback actually disengaged the
    * broadcast on a planted high-reach graph.
    */
  /** Multi-seed [[khop]]: ALL seeds advance in ONE frontier frame keyed
    * (seed, node), so s seeds × h hops cost h joins instead of s·h —
    * the ANF/reach-distribution shape (`q_graph_reach_dist` measured
    * 12.9 s as 4 sequential loops; one shared loop more than halves it).
    * Same broadcast-fallback contract, with the observer reporting the
    * combined visited count per round.
    */
  def khopMulti(bidir: DataFrame, seeds: Seq[Long], hops: Int,
      broadcastLimit: Long = 4000000L,
      onRound: (Int, Long, Boolean) => Unit = (_, _, _) => ()): DataFrame = {
    require(seeds.nonEmpty, "at least one seed")
    val s = bidir.sparkSession
    import s.implicits._
    var visited = seeds.toDF("seed")
      .select(col("seed"), col("seed").as("node"), lit(0L).as("hop")).persist()
    var visitedCount = visited.count()
    for (h <- 1 to hops) {
      val frontier = visited.where(col("hop") === (h - 1).toLong).select("seed", "node")
      val useBroadcast = visitedCount <= broadcastLimit
      onRound(h, visitedCount, useBroadcast)
      val anti = if (useBroadcast) F.broadcast(visited.select("seed", "node")) else visited.select("seed", "node")
      val expanded = frontier.join(bidir, col("node") === col("a"))
        .select(col("seed"), col("b").as("node"))
      // r14 (guide §2.3, filter before the exchange): on the broadcast
      // path the visited anti-join is a MAP-SIDE filter, so running it
      // BEFORE the distinct drops already-visited expansions before they
      // are shuffled — in a dense graph the late-hop frontier mostly
      // re-reaches visited nodes, so this is most of the exchange's
      // input. On the shuffle fallback the anti-join is itself an
      // exchange, so the old distinct-first order (shrink the anti's
      // probe side) stays. Output is identical either way (set
      // difference and dedup commute) — BfsFallbackSpec pins it.
      val reached = (if (useBroadcast)
        expanded.join(anti, Seq("seed", "node"), "left_anti").distinct()
      else
        expanded.distinct().join(anti, Seq("seed", "node"), "left_anti"))
        .select(col("seed"), col("node"), lit(h.toLong).as("hop"))
      val next = visited.unionByName(reached).persist()
      visitedCount = next.count()
      visited.unpersist()
      visited = next
    }
    visited
  }

  def khop(bidir: DataFrame, seed: Long, hops: Int,
      broadcastLimit: Long = 4000000L,
      onRound: (Int, Long, Boolean) => Unit = (_, _, _) => ()): DataFrame = {
    val s = bidir.sparkSession
    var visited = s.range(1).select(lit(seed).as("node"), lit(0L).as("hop")).persist()
    var visitedCount = visited.count()
    for (h <- 1 to hops) {
      val frontier = visited.where(col("hop") === (h - 1).toLong).select("node")
      val useBroadcast = visitedCount <= broadcastLimit
      onRound(h, visitedCount, useBroadcast)
      val anti = if (useBroadcast) F.broadcast(visited) else visited
      val expanded = frontier.join(bidir, col("node") === col("a"))
        .select(col("b").as("node"))
      // r14: anti-before-distinct on the broadcast path — see khopMulti
      val reached = (if (useBroadcast)
        expanded.join(anti, Seq("node"), "left_anti").distinct()
      else
        expanded.distinct().join(anti, Seq("node"), "left_anti"))
        .select(col("node"), lit(h.toLong).as("hop"))
      val next = visited.unionByName(reached).persist()
      visitedCount = next.count()
      visited.unpersist()
      visited = next
    }
    visited
  }
}
