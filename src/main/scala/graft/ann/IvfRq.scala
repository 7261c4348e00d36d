package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vec.{Rq, Vec}

/** Composite IVF + residual-quantization index — the production ANN
  * shape (the FAISS IVF-PQ/IVF-RQ family, Jégou et al.): a coarse
  * spherical-k-means cell partition prunes the corpus per query, and an
  * exact-integer residual codebook compresses what remains, so probing
  * touches only nProbe cells' worth of (cell id, code id) pairs — never
  * raw vectors. Approximate distance is computed against the
  * RECONSTRUCTION (cell centroid + residual codeword), all in quantized
  * integer arithmetic, so the whole probe path mirrors to SQL exactly.
  *
  * 100 TB shape: both codebooks are bounded driver metadata riding as
  * codegen literals (the IVF/PQ/RQ contract); encode is one map-side
  * pass; a probe joins the bounded query×cell list against the
  * cell-keyed code table — the corpus never shuffles and the only
  * per-query work is nProbe cells' candidates × an O(d) integer fold.
  */
object IvfRq {

  /** Milli-quantized centroids: HALF_UP = away-from-zero on both engines. */
  def milliQuant(cents: Seq[Seq[Double]]): Seq[Seq[Long]] =
    cents.map(_.map(x =>
      java.math.BigDecimal.valueOf(x * 1000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()))

  /** Top-k per query over the IVF-RQ index built on `emb`:
    * (query_id, vec_id, adist, rnk) with adist the exact-integer L2
    * between the query's quantized vector and the candidate's
    * reconstruction. Queries never retrieve themselves.
    */
  def topK(
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nProbe: Int = 2,
      kCells: Int = 16,
      kCodes: Int = 16): DataFrame = {
    val cents = KMeans.fit(emb, kCells, iters = 1).toSeq.map(_.toSeq)
    val qc = milliQuant(cents)
    val qcLit = typedLit(qc)
    val assigned = Ann.assignCells(emb, cents)
    val q = emb.select(col("vec_id"), Vec.quantize(col("embedding")).as("q"))
    val residuals = q.join(assigned, "vec_id")
      .select(col("vec_id"),
        zip_with(col("q"), element_at(qcLit, col("cell").cast("int") + 1),
          (x, y) => x - y).as("r"))
    val cb = Rq.fit(residuals, kCodes, iters = 1).toSeq.map(_.toSeq)
    val cbLit = typedLit(cb)
    val rq = Rq.assign(residuals, cb).select(col("vec_id"), col("cell").as("rq_cell"))
    // reconstruction = coarse centroid + residual codeword (both literals)
    val recon = assigned.join(rq, "vec_id")
      .select(col("vec_id"),
        zip_with(element_at(qcLit, col("cell").cast("int") + 1),
          element_at(cbLit, col("rq_cell").cast("int") + 1),
          (x, y) => x + y).as("v"))
    // probe: top-nProbe cells per query by the SAME cosine cell scores
    // the assignment uses (ties to the lower cell)
    val probes = emb.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"),
        posexplode(Cells.cellScores(col("embedding"), cents)).as(Seq("cell", "score")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("score"), col("cell"))))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("cell").cast("long").as("cell"))
    val cand = probes.join(assigned, "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
    val qv = q.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("q").as("qv"))
    val scored = cand.join(qv, "query_id").join(recon, "vec_id")
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
          lit(0L), (a, b) => a + b).as("adist"))
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("query_id", "vec_id", "adist", "rnk")
      .orderBy("query_id", "rnk")
  }
}
