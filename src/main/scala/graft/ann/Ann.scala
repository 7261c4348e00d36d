package graft.ann

import graft.vec.Vec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the *baseline*: broadcast the (small) query set and
  * scan the corpus once — no shuffle of the corpus, scales linearly to
  * 100 TB with zero data movement beyond the final top-k per query
  * (window over per-query candidates).
  *
  * The scale path is sign-LSH: bucket the corpus once (amortizable at
  * write time by persisting `bucket` as a partition column), then probe
  * only matching buckets per query.
  *
  * Cosines are computed over integer-quantized vectors (see Vec.cosineQ)
  * and rounded to 6 decimals *before* ranking so ranking is deterministic
  * and oracle-reproducible; vec_id breaks ties.
  */
object Ann {

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rnk").cast("long").as("rnk"))
  }

  /** Exact top-k by cosine for each query id, via broadcast + one scan. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val q = embeddings
      .where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), Vec.quantize(col("embedding")).as("qv"))
    val corpus = embeddings.select(col("vec_id"), Vec.quantize(col("embedding")).as("cv"))
    val scored = corpus
      .join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(Vec.cosineQ(col("qv"), col("cv")), 6).as("cosine"))
    rank(scored, k)
  }

  /** LSH-bucketed top-k: probes only the query's bucket. Recall < 1 by
    * construction; p controls bucket granularity (2^p buckets).
    */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10, p: Int = 8): DataFrame = {
    val bucketed = embeddings.select(
      col("vec_id"),
      Vec.quantize(col("embedding")).as("cv"),
      Vec.lshBucket(col("embedding"), p).as("bucket"))
    val q = bucketed
      .where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("cv").as("qv"), col("bucket"))
    val scored = bucketed
      .join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(Vec.cosineQ(col("qv"), col("cv")), 6).as("cosine"))
    rank(scored, k)
  }
}
