package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval.
  *
  * Reciprocal-rank fusion (Cormack & Clarke, SIGIR'09):
  * rrf(d) = Σ_legs 1/(k0 + rank_leg(d)), k0 = 60 in the original paper.
  * RRF needs only RANKS, so legs with incomparable scores (cosine vs
  * BM25) fuse without calibration — the reason it's the default hybrid
  * combiner in production retrieval stacks.
  *
  * Cross-engine exactness: each term is one division of exact integers
  * and the two terms add in a fixed order, so an oracle reproduces the
  * doubles bit-for-bit. A document missing from a leg contributes 0
  * (NULL rank → coalesce), the standard convention.
  *
  * Scale: both legs arrive already top-k-truncated per query (the
  * expensive part happened inside the ANN / BM25 operators), so the
  * fusion join touches O(queries × k) rows regardless of corpus size;
  * the final per-query window runs on ≤ 2k rows per query.
  */
object Fusion {

  /** Fuse two rank legs. `vecLeg` columns: (query_id, vec_id, vrnk);
    * `lexLeg` columns: (query_id, vec_id, lrnk). Returns the fused
    * top-`topK` per query with both source ranks kept for audit.
    */
  def rrf2(vecLeg: DataFrame, lexLeg: DataFrame, k0: Double = 60.0, topK: Int = 10): DataFrame = {
    require(topK > 0 && k0 > 0, s"rrf2: need positive topK/k0, got $topK/$k0")
    val rrf =
      coalesce(lit(1.0) / (lit(k0) + col("vrnk").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(k0) + col("lrnk").cast("double")), lit(0.0))
    val w = Window.partitionBy("query_id").orderBy(desc("rrf"), col("vec_id"))
    vecLeg.join(lexLeg, Seq("query_id", "vec_id"), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= topK)
      .select("query_id", "vec_id", "vrnk", "lrnk", "rrf", "rnk")
  }
}
