package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate candidate graph: every doc
  * in a duplicate cluster gets the cluster's minimum doc_id as its
  * cluster id — the survivor-selection step after pairwise dedup.
  *
  * Algorithm: iterative min-label propagation (the DataFrame form of
  * Pregel/HashMin). Each round every node takes the min label among
  * itself and its neighbors; rounds repeat until a fixpoint. Round count
  * is bounded by the cluster diameter — near-dup clusters are shallow
  * (template families), so a handful of shuffle-join rounds suffice at
  * any corpus size; each round is one equi-join + one groupBy, both
  * map-side-combined, nothing pairwise, nothing on the driver but the
  * convergence counter.
  */
object Components {

  /** `edges`: (doc_a, doc_b) undirected pairs. Returns (doc_id,
    * cluster_id) for every doc appearing in an edge — cluster_id = min
    * doc_id reachable. `maxIters` is a safety bound (diameter cap).
    */
  def minLabel(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // candidate label per node: min over own label and neighbors'
      // labels. (r15 negative result: a pointer-doubling shortcut round
      // — min with the label's own label — was tried and REVERTED:
      // near-dup component diameters are already shallow, so the extra
      // labels⋈labels join per round cost more than the rounds it could
      // save; dedup_embed_clusters 4.2→7.6 s isolated.)
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .select(col("src").as("doc_id"), col("cluster_id"))
      // localCheckpoint, not persist: persist materializes but leaves the
      // logical plan nested one level deeper per round, and Catalyst
      // re-analysis of that tower turns quadratic-plus in round count —
      // a deep graph (long cosine chains) stalled PLANNING for minutes
      // while the jobs themselves were milliseconds. The checkpoint cuts
      // the plan to a leaf, so analysis stays O(1) per round. The old
      // label rides along as `prev` (r15) so the convergence probe is a
      // scan of the checkpointed blocks, not a second join job.
      val next = labels.select(col("doc_id"), col("cluster_id"))
        .union(viaNeighbors)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .join(labels.withColumnRenamed("cluster_id", "prev"), Seq("doc_id"))
        .localCheckpoint(true)
      val changed = next.where(col("cluster_id") =!= col("prev")).count()
      labels.unpersist(blocking = false)
      labels = next.select(col("doc_id"), col("cluster_id"))
      converged = changed == 0
      it += 1
    }
    sym.unpersist(blocking = false)
    if (!converged) {
      labels.unpersist(blocking = false)
      // silently-wrong cluster ids would over-retain near-dups; fail loudly
      throw new IllegalStateException(
        s"Components.minLabel did not converge within $maxIters rounds — " +
          "a component's diameter exceeds the bound; raise maxIters")
    }
    labels // persisted; caller owns lifecycle (same contract as Dedup.*)
  }
}
