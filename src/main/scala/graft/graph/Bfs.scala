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
  *
  * r15 round shape (guide §2.4, the PageRank dst-partition precedent):
  *  - the visited set lives as PER-HOP LAYER frames, so each round
  *    persists and counts only the NEW layer instead of re-caching the
  *    whole growing union (the count is still the per-round driver
  *    barrier that materializes the round's work — memory-of-r14: only
  *    remove a barrier when another job's lineage materializes the
  *    frame, and here nothing else would);
  *  - the hop-0 count is `seeds.length` — workload metadata the caller
  *    already holds, not a job;
  *  - when the caller hands in a `bidir` frame hash-partitioned by `b`
  *    (see [[khopMulti]] docs), the frontier-edge join broadcasts the
  *    frontier and STREAMS the partitioned edges, the projection
  *    aliases `b` to `node`, and the per-round `distinct` on
  *    (seed, node) is satisfied by the inherited partitioning — zero
  *    exchanges per broadcast-path round; one up-front edge shuffle
  *    replaces `hops` exchanges of the (much larger) expanded frontier.
  *    On the shuffle fallback the joins pay their own exchanges exactly
  *    as before.
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
    val layers = khopMultiLayers(bidir, seeds, hops, broadcastLimit, onRound)
    // single persisted union preserves the pre-r15 caller contract
    // (returned frame is persisted; caller unpersists): one scan of the
    // already-cached layers fills it, then the layers release
    val out = layers.map(_._1).reduce(_ unionByName _).persist()
    out.count()
    layers.foreach(_._1.unpersist(blocking = false))
    out
  }

  /** [[khopMulti]] returning the per-hop layers instead of one
    * re-cached union: element h is (layer, rowCount) where the layer
    * holds exactly the `(seed, node, hop=h)` rows first reached at hop
    * h, persisted and already materialized, and rowCount is its size
    * (already paid for by the round barrier — a hop histogram needs no
    * further job). Callers that consume the visited set ONCE (a single
    * aggregate) should union the layers lazily and unpersist each —
    * that skips the union's second cache write entirely.
    */
  def khopMultiLayers(bidir: DataFrame, seeds: Seq[Long], hops: Int,
      broadcastLimit: Long = 4000000L,
      onRound: (Int, Long, Boolean) => Unit = (_, _, _) => ()): Seq[(DataFrame, Long)] = {
    require(seeds.nonEmpty, "at least one seed")
    val s = bidir.sparkSession
    import s.implicits._
    val layer0 = seeds.toDF("seed")
      .select(col("seed"), col("seed").as("node"), lit(0L).as("hop")).persist()
    // hop-0 visited count = the seed list's length (a local relation);
    // the pre-r15 shape paid a Spark job to count it
    var layers = Vector((layer0, seeds.length.toLong))
    var visitedCount = seeds.length.toLong
    for (h <- 1 to hops) {
      val frontier = layers.last._1.select("seed", "node")
      val visited = layers.map(_._1.select("seed", "node")).reduce(_ unionByName _)
      val useBroadcast = visitedCount <= broadcastLimit
      onRound(h, visitedCount, useBroadcast)
      val anti = if (useBroadcast) F.broadcast(visited) else visited
      // broadcast the bounded frontier explicitly so the partitioned
      // edge side is always the streamed one (plan-shape, not results:
      // the join output is identical either way)
      val expanded = (if (useBroadcast) F.broadcast(frontier) else frontier)
        .join(bidir, col("node") === col("a"))
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
        .persist()
      val cnt = reached.count()
      visitedCount += cnt
      layers :+= ((reached, cnt))
    }
    layers
  }

  def khop(bidir: DataFrame, seed: Long, hops: Int,
      broadcastLimit: Long = 4000000L,
      onRound: (Int, Long, Boolean) => Unit = (_, _, _) => ()): DataFrame = {
    val layers = khopLayers(bidir, seed, hops, broadcastLimit, onRound)
    val out = layers.map(_._1).reduce(_ unionByName _).persist()
    out.count()
    layers.foreach(_._1.unpersist(blocking = false))
    out
  }

  /** [[khop]] returning per-hop layers — see [[khopMultiLayers]]. */
  def khopLayers(bidir: DataFrame, seed: Long, hops: Int,
      broadcastLimit: Long = 4000000L,
      onRound: (Int, Long, Boolean) => Unit = (_, _, _) => ()): Seq[(DataFrame, Long)] = {
    val s = bidir.sparkSession
    val layer0 = s.range(1).select(lit(seed).as("node"), lit(0L).as("hop")).persist()
    var layers = Vector((layer0, 1L))
    var visitedCount = 1L
    for (h <- 1 to hops) {
      val frontier = layers.last._1.select("node")
      val visited = layers.map(_._1.select("node")).reduce(_ unionByName _)
      val useBroadcast = visitedCount <= broadcastLimit
      onRound(h, visitedCount, useBroadcast)
      val anti = if (useBroadcast) F.broadcast(visited) else visited
      val expanded = (if (useBroadcast) F.broadcast(frontier) else frontier)
        .join(bidir, col("node") === col("a"))
        .select(col("b").as("node"))
      // r14: anti-before-distinct on the broadcast path — see khopMultiLayers
      val reached = (if (useBroadcast)
        expanded.join(anti, Seq("node"), "left_anti").distinct()
      else
        expanded.distinct().join(anti, Seq("node"), "left_anti"))
        .select(col("node"), lit(h.toLong).as("hop"))
        .persist()
      val cnt = reached.count()
      visitedCount += cnt
      layers :+= ((reached, cnt))
    }
    layers
  }
}
