package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et
  * al. 2007) with fixed rounds and a total-order tie-break — fully
  * deterministic, so an SQL oracle can unroll the rounds as chained
  * CTEs and match bit-for-bit.
  *
  * Unlike HashMin connected components (pure reachability), the
  * MAJORITY vote finds densely-linked clusters inside one component: a
  * single bridge edge between two cliques never outvotes either
  * clique's internal edges.
  *
  * Scale contract: each round is one equi-join of the edge list with
  * the current (node, label) frame plus one windowless
  * min(struct(−cnt, lbl)) argmax — map-side combinable, so a hub with
  * millions of neighbors never hot-keys a window partition. Driver
  * state per round is one bounded materialization count (the
  * KMeans/PageRank iterative-convergence contract).
  */
object LabelProp {

  /** `(node, lbl)` after `rounds` synchronous label-propagation rounds
    * over a BIDIRECTIONAL edge list `bidir(a, b)` (undirected graphs
    * must pass both orientations). Initial label = the node itself;
    * each round every node adopts its neighborhood's majority label,
    * ties broken toward the smallest label. The returned frame is
    * persisted; callers unpersist after consuming.
    */
  def communities(bidir: DataFrame, rounds: Int): DataFrame = {
    var labels = bidir.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node")).persist()
    labels.count()
    for (_ <- 1 to rounds) {
      val counted = bidir
        .join(labels.select(col("node").as("b"), col("lbl")), "b")
        .groupBy(col("a").as("node"), col("lbl")).agg(count(lit(1)).as("cnt"))
      val next = counted.groupBy("node")
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("w"))
        .select(col("node"), col("w.l").as("lbl")).persist()
      next.count(); labels.unpersist(); labels = next
    }
    labels
  }
}
