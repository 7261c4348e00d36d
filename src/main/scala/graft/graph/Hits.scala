package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration weighted HITS (Kleinberg 1999) — hubs-and-authorities
  * centrality over a directed WEIGHTED edge frame, the complement of
  * [[PageRank]]: PageRank measures where a random surfer settles, HITS
  * separates "points at good things" (hub) from "is pointed at by good
  * hubs" (authority) — on a trade graph, exporter-of-choice vs
  * importer-of-choice.
  *
  * Integer fixed-point throughout (the PageRank contract): scores live
  * in parts of `scale`; each half-iteration L1-normalizes with a
  * truncating integral divide so the vector sums back to ~`scale`. The
  * raw×scale product runs over decimal(38,0) on Spark and HUGEINT in
  * the oracle — raw sums reach weight·scale·degree, which would wrap
  * int64 exactly where the engines diverge. Everything is
  * order-independent integer arithmetic → bit-reproducible and
  * SQL-mirrorable.
  *
  * Scale shape per iteration: two equi-joins of the edge frame with a
  * node-score frame + two map-side-combined groupBys (|edges| shuffle
  * rows) + two 1-row total aggregates (graph metadata, the PageRank
  * `nodes.count()` precedent). Per-iteration persist/unpersist.
  */
object Hits {

  /** `edges(src, dst, cnt)` directed weighted edges (distinct pairs).
    * Returns `(node, hub, authority)` after `iters` iterations.
    */
  def run(edges: DataFrame, iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col("src"), col("dst"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // graph metadata, not a data collect
    require(n > 0, "empty graph")
    var hubs = nodes.select(col("node"), lit(scale / n).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var auths: DataFrame = null
    // (r14 note: an in-plan 1-row cross-joined total — the oracle's own
    // shape — was tried to make the whole loop lazy and was REVERTED: the
    // resulting 6-level cascade of nested cached/broadcast plans stalled
    // materialization at sf0.1. The driver-literal total stays; the
    // per-half-iteration count() jobs are gone — see the loop below.)
    def normalized(raw: DataFrame, outName: String): DataFrame = {
      // L1 total as a driver literal (1-row aggregate over <= |nodes| rows)
      val total = BigInt(raw.agg(sum(expr("cast(raw as decimal(38,0))")).as("t"))
        .head().getDecimal(0).toBigInteger)
      require(total > 0, "HITS total must be positive")
      nodes.join(raw, Seq("node"), "left")
        .select(col("node"),
          coalesce(
            expr(s"cast((cast(raw as decimal(38,0)) * $scale) div " +
              s"cast('$total' as decimal(38,0)) as bigint)"),
            lit(0L)).as(outName))
    }
    // r14: no per-half-iteration count() materialization jobs — each
    // normalized() call already runs a driver total aggregate whose
    // lineage materializes the PREVIOUS half-iteration's persisted frame
    // as a side effect, so the explicit counts were one redundant job per
    // half-iteration. Unpersists happen one step later, after the
    // successor total-agg job that consumed the frame. Arithmetic is
    // untouched — scores stay bit-identical.
    for (_ <- 1 to iters) {
      // r15: localCheckpoint(eager) on each half-iteration's RAW frame —
      // persist() materializes but leaves the logical plan one join-tower
      // level deeper per half-iteration, and Catalyst re-analysis of that
      // tower (6 levels over 3 iterations) dominated the key: 64 jobs
      // summing to 1.9 s of execution inside a 5.0 s wall (the
      // Components.minLabel lesson applied here). The checkpoint cuts the
      // plan to a leaf; the subsequent total agg and join read the
      // materialized blocks. Arithmetic untouched — scores bit-identical.
      val aRaw = e.join(hubs.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("cast(cnt as decimal(20,0)) * h").as("c"))
        .groupBy("node").agg(sum("c").as("raw"))
        .localCheckpoint(true)
      val aNext = normalized(aRaw, "authority")
      auths = aNext
      val hRaw = e.join(auths.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"),
          expr("cast(cnt as decimal(20,0)) * authority").as("c"))
        .groupBy("node").agg(sum("c").as("raw"))
        .localCheckpoint(true)
      val hNext = normalized(hRaw, "h")
      hubs = hNext
    }
    val out = hubs.withColumnRenamed("h", "hub")
      .join(auths, Seq("node"))
      .select("node", "hub", "authority")
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    hubs.unpersist(blocking = false)
    auths.unpersist(blocking = false)
    out // persisted; caller owns lifecycle (PageRank contract)
  }

  /** [[run]] evaluated on the driver for DIMENSION-BOUNDED graphs
    * (r15, guide §1.2 step 1 — don't run a cluster loop over metadata):
    * the nation-trade graph is ≤ nations² ≈ 625 edges at ANY corpus
    * size, so after the one distributed fact-scan edge derivation the
    * 3-iteration loop is pure scheduling overhead (measured: 58 jobs
    * summing 1.9 s of execution inside a 3.5-5 s wall). Collects the
    * edge frame (hard-bounded — REFUSES above `maxEdges`, this is not
    * for data-scale graphs) and replays the exact integer fixed-point:
    * BigInt products/divides mirror the decimal(38,0)/HUGEINT
    * arithmetic bit-for-bit (all values positive, so BigInt's truncating
    * divide equals decimal `div`). R15OptSpec pins runLocal ≡ run on the
    * real graph and on a planted no-in-edge graph.
    */
  def runLocal(
      edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
      maxEdges: Int = 1 << 20): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val rows = edges.select(
        col("src").cast("long"), col("dst").cast("long"), col("cnt").cast("long"))
      .limit(maxEdges + 1).collect()
    require(rows.length <= maxEdges,
      s"runLocal is for dimension-bounded graphs: got > $maxEdges edges — use run()")
    val es = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.length
    require(n > 0, "empty graph")
    var h: Map[Long, BigInt] = nodes.map(_ -> BigInt(scale / n)).toMap
    var a: Map[Long, BigInt] = Map.empty
    val bScale = BigInt(scale)
    def norm(raw: Map[Long, BigInt]): Map[Long, BigInt] = {
      val total = raw.values.sum
      require(total > 0, "HITS total must be positive")
      nodes.map(nd => nd -> raw.getOrElse(nd, BigInt(0)) * bScale / total).toMap
    }
    for (_ <- 1 to iters) {
      a = norm(es.groupBy(_._2).map { case (d, g) =>
        d -> g.iterator.map(e => BigInt(e._3) * h(e._1)).sum })
      h = norm(es.groupBy(_._1).map { case (s2, g) =>
        s2 -> g.iterator.map(e => BigInt(e._3) * a(e._2)).sum })
    }
    val spark = edges.sparkSession
    import spark.implicits._
    nodes.map(nd => (nd, h(nd).toLong, a(nd).toLong)).toSeq
      .toDF("node", "hub", "authority")
  }

  /** DuckDB oracle for [[run]]: iterations unrolled as chained CTEs over
    * an `edges(src, dst, cnt)` CTE the caller supplies.
    */
  def oracleSql(edgesCte: String, iters: Int, scale: Long = 1000000000000L): String = {
    def norm(rawRel: String, outRel: String, colName: String) =
      s"""${rawRel}t AS (SELECT CAST(SUM(CAST(raw AS HUGEINT)) AS HUGEINT) AS t FROM $rawRel),
         |$outRel AS (
         |  SELECT n.node,
         |    CAST(COALESCE(CAST(r.raw AS HUGEINT) * $scale // tt.t, 0) AS BIGINT) AS $colName
         |  FROM nodes n CROSS JOIN ${rawRel}t tt LEFT JOIN $rawRel r ON n.node = r.node)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""ar$i AS (
         |  SELECT e.dst AS node, CAST(SUM(CAST(e.cnt AS HUGEINT) * h.h) AS HUGEINT) AS raw
         |  FROM edges e JOIN h${i - 1} h ON e.src = h.node GROUP BY 1),
         |${norm(s"ar$i", s"a$i", "authority")},
         |hr$i AS (
         |  SELECT e.src AS node, CAST(SUM(CAST(e.cnt AS HUGEINT) * a.authority) AS HUGEINT) AS raw
         |  FROM edges e JOIN a$i a ON e.dst = a.node GROUP BY 1),
         |${norm(s"hr$i", s"h$i", "h")}""".stripMargin
    }.mkString(",\n")
    s"""edges AS MATERIALIZED ($edgesCte),
       |nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |h0 AS (
       |  SELECT node, CAST($scale // (SELECT count(*) FROM nodes) AS BIGINT) AS h FROM nodes),
       |$iterCtes""".stripMargin
  }
}
