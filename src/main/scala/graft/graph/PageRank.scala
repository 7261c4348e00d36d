package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over an edge frame — link-graph centrality
  * is a standard corpus-quality signal (CommonCrawl-style pipelines
  * rank domains by it) and the canonical iterative-join workload.
  *
  * Integer fixed-point arithmetic throughout: ranks live in parts of
  * `scale` (default 1e12), contributions are truncating integer
  * divisions, and the damping step is `(85 * s) div 100`. Integer sums
  * are order-independent, so results are bit-reproducible across
  * cluster sizes AND SQL-expressible — the oracle unrolls the same
  * iterations in DuckDB with `//` arithmetic.
  *
  * Scale shape per iteration: one equi-join of edges with the rank
  * frame (shuffle bounded by |edges|) and one map-side-combined groupBy
  * on dst — identical to dedup.Components' per-round cost, with a FIXED
  * iteration count instead of convergence detection. Dangling nodes
  * (out-degree 0) absorb their rank (the classic no-redistribution
  * variant); nodes with no in-edges settle at the damping base.
  */
object PageRank {

  /** `edges(src: long, dst: long)` must be distinct pairs. Returns
    * `(node, rank)` after `iters` damped iterations at `scale`.
    */
  def run(edges: DataFrame, iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "at least one iteration")
    // materialize the (possibly expensive) edge derivation ONCE — the
    // iteration re-references it every round, and so do nodes/outDeg.
    // r14 (guide §2.4, establish the partitioning once): the cached edge
    // frame is hash-partitioned by dst UP FRONT, so every iteration's
    // contribution groupBy(dst) — the only per-round |edges|-sized
    // exchange — reuses the cached layout and shuffles NOTHING once the
    // rank side broadcasts (rank frames are node-sized; when a 100×
    // graph's rank frame outgrows the broadcast threshold the join
    // degrades to the old shuffled shape, no worse than before). One
    // up-front edge shuffle buys `iters` shuffle-free rounds.
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // graph metadata (node count), not a data collect
    require(n > 0, "empty graph")
    val r0 = scale / n
    val base = (15L * r0) / 100L
    var ranks = nodes.select(col("node"), lit(r0).as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85L * coalesce(s, 0L)) div 100L")).as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      ranks.unpersist(blocking = false)
      ranks = next
    }
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    outDeg.unpersist(blocking = false)
    ranks // persisted; caller owns lifecycle (same contract as Dedup.*)
  }

  /** [[run]] evaluated on the driver for DIMENSION-BOUNDED graphs (r15
    * — see [[Hits.runLocal]] for the rationale and the bound contract):
    * the nation-trade graph is ≤ nations² edges at any corpus size; the
    * distributed 3-iteration loop there is pure scheduling overhead.
    * Long arithmetic replicates [[run]] exactly (same widths, same
    * truncating `div` on positives). REFUSES above `maxEdges` — the
    * crawl/co-purchase graphs keep the distributed loop. (A
    * checkpoint-truncated variant of the distributed loop was ALSO
    * tried for those and reverted: q_graph_ppr 3.8→4.3 s — the
    * checkpoint loses the cached partitioning and AQE of the persisted
    * rank frame; the per-round persist+count stays load-bearing.)
    */
  def runLocal(
      edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
      maxEdges: Int = 1 << 20): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val rows = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .limit(maxEdges + 1).collect()
    require(rows.length <= maxEdges,
      s"runLocal is for dimension-bounded graphs: got > $maxEdges edges — use run()")
    val es = rows.map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.length
    require(n > 0, "empty graph")
    val deg: Map[Long, Long] =
      es.groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    val r0 = scale / n
    val base = (15L * r0) / 100L
    var ranks: Map[Long, Long] = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val contrib = es.groupBy(_._2).map { case (d, g) =>
        d -> g.iterator.map(e => ranks(e._1) / deg(e._1)).sum }
      ranks = nodes.map(nd =>
        nd -> (base + (85L * contrib.getOrElse(nd, 0L)) / 100L)).toMap
    }
    val spark = edges.sparkSession
    import spark.implicits._
    nodes.map(nd => (nd, ranks(nd))).toSeq.toDF("node", "rank")
  }

  /** Personalized PageRank (Haveliwala 2002): identical to [[run]]
    * except ALL teleport mass returns to one seed node — r0 puts the
    * whole `scale` at the seed and each iteration's base term
    * `(15·scale) div 100` lands only there, so ranks measure proximity
    * TO THE SEED rather than global centrality (the random-walk twin of
    * k-hop BFS: BFS answers "reachable in h hops", PPR answers "how
    * much stationary mass lands here"). Same per-iteration cost and
    * the same integer fixed-point bit-reproducibility contract.
    */
  def runPersonalized(
      edges: DataFrame, seed: Long, iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "at least one iteration")
    // r14: dst-partitioned cached edges — see [[run]]
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = (15L * scale) / 100L
    var ranks = nodes
      .select(col("node"), when(col("node") === seed, scale).otherwise(0L).as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (when(col("node") === seed, base).otherwise(0L) +
            expr("(85L * coalesce(s, 0L)) div 100L")).as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      ranks.unpersist(blocking = false)
      ranks = next
    }
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    outDeg.unpersist(blocking = false)
    ranks
  }

  /** DuckDB oracle for [[runPersonalized]]: caller supplies the edge
    * CTE and a 1-row `seed(node)` CTE body; iterations unroll exactly
    * like [[oracleSql]] with the base term gated on the seed.
    */
  def personalizedOracleSql(
      edgesCte: String, seedCte: String, iters: Int,
      scale: Long = 1000000000000L): String = {
    val base = (15L * scale) / 100L
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT n.node,
         |    CAST(CASE WHEN n.node = sd.node THEN $base ELSE 0 END
         |      + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n CROSS JOIN seed sd LEFT JOIN c$i c ON n.node = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""edges AS MATERIALIZED ($edgesCte),
       |nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
       |seed AS MATERIALIZED ($seedCte),
       |r0 AS (
       |  SELECT n.node, CAST(CASE WHEN n.node = sd.node THEN $scale ELSE 0 END AS BIGINT) AS rank
       |  FROM nodes n CROSS JOIN seed sd),
       |$iterCtes""".stripMargin
  }

  /** DuckDB oracle for [[run]]: the same iterations unrolled as chained
    * CTEs over an `edges` CTE the caller supplies (must produce
    * identical distinct (src, dst) BIGINT pairs).
    */
  def oracleSql(edgesCte: String, iters: Int, scale: Long = 1000000000000L): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT n.node, CAST(p.base + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n CROSS JOIN params p LEFT JOIN c$i c ON n.node = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""edges AS MATERIALIZED ($edgesCte),
       |nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
       |params AS (
       |  SELECT CAST($scale // count(*) AS BIGINT) AS r0v,
       |    CAST((15 * ($scale // count(*))) // 100 AS BIGINT) AS base
       |  FROM nodes),
       |r0 AS (SELECT node, r0v AS rank FROM nodes CROSS JOIN params),
       |$iterCtes""".stripMargin
  }
}
