package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-node triangle counting via the degree-ordered node-iterator
  * (public construction: Schank & Wagner's forward algorithm / the
  * "compact-forward" family) — the standard graph-locality signal for
  * link-graph corpus curation, and the canonical example of taming a
  * quadratic wedge join.
  *
  * Every edge is oriented from its (degree, id)-smaller endpoint to the
  * larger; wedges are generated only from a node's OUT-neighbors. That
  * bounds per-node wedge generation by out-degree², and orientation
  * bounds out-degree at O(sqrt(m)) on any graph — so the wedge join is
  * O(m^1.5) total instead of sum(deg²), and a viral hub (deg ~ n) never
  * fans out: its edges all point INTO it.
  *
  * Shuffle shape: two broadcast-or-shuffle equi-joins to attach degrees,
  * one self-equi-join on src (the wedge join), one equi-join against the
  * edge set (closure check, left_semi — no payload), one explode+groupBy
  * for per-node counts. All map-side-combinable, no windows, no
  * cartesian products; all counts integer → oracle-exact.
  */
object Triangles {

  /** `edges(a: long, b: long)` must be DISTINCT CANONICAL pairs
    * (a < b, no self-loops). Returns (node, n_tri) for nodes in >= 1
    * triangle; caller owns the returned persisted frame's lifecycle.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("a"), col("b")).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e0.select(col("a").as("node"))
      .unionByName(e0.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val aFirst = struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b"))
    val oriented = e0
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    val wedges = oriented.as("x")
      .join(oriented.as("y"), Seq("src"))
      .where(col("x.dst") < col("y.dst"))
      .select(col("src").as("u"), col("x.dst").as("v"), col("y.dst").as("w"))
    // closure: wedge (v, w) is already canonically ordered (v < w), as is
    // the edge set — a payload-free semi-join decides each triangle
    val tris = wedges.join(
      e0, col("v") === col("a") && col("w") === col("b"), "left_semi")
    val out = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    e0.unpersist(blocking = false)
    out
  }
}
