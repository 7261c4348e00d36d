package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Residual quantization (RQ) — the two-level ANN compression that
  * complements PQ: level 1 is the spherical k-means IVF fit (doubles,
  * the proven [[graft.ann.KMeans]] kernel); the RESIDUAL of each vector
  * against its milli-quantized centroid is then fitted with a second,
  * EXACT-INTEGER L2 codebook. Every level-2 quantity — distances,
  * centroid updates (truncating division), distortions — is 64-bit
  * integer arithmetic, so the fit is bit-reproducible under any shuffle
  * order and mirrors to SQL with zero float-parity hazards.
  *
  * Scale shape per iteration (the KMeans contract): assignment is
  * map-side against the k×d codebook literal (the corpus of residuals
  * never shuffles); the update shuffles only (cell, dim) partial sums
  * with map-side combine — k·d rows regardless of corpus size; driver
  * state is the k×d codebook.
  */
object Rq {

  /** Integer squared-L2 distances of residual column `r` (array<long>)
    * against every codebook row, as an array<long> column.
    */
  def l2Dists(r: Column, cb: Seq[Seq[Long]]): Column =
    // fused one-pass kernel (r14): the compositional transform/aggregate
    // form walked the residual k times with an intermediate array per
    // cell; bit-identical integer sums (R14OptSpec)
    graft.functions.vexprs.l2_dists_q(r, cb)

  /** `(vec_id, r, cell, sq_err)` — nearest codebook row by exact
    * integer L2, ties to the lower cell index (array_position returns
    * the FIRST minimum).
    */
  def assign(residuals: DataFrame, cb: Seq[Seq[Long]]): DataFrame = {
    val ds = l2Dists(col("r"), cb)
    residuals
      .select(col("vec_id"), col("r"), ds.as("ds"))
      .select(col("vec_id"), col("r"),
        (array_position(col("ds"), array_min(col("ds"))) - 1).cast("long").as("cell"),
        array_min(col("ds")).as("sq_err"))
  }

  /** Fit `k` integer codebook rows over `residuals(vec_id, r)` —
    * deterministic lowest-k-id init, `iters` Lloyd iterations with
    * truncating-division centroid updates (empty cells keep their
    * previous row). All-integer: re-runs and the SQL mirror agree
    * bit-for-bit.
    */
  def fit(residuals: DataFrame, k: Int, iters: Int = 1): Array[Array[Long]] = {
    var cb: Array[Array[Long]] = residuals
      .where(col("vec_id") < k).orderBy("vec_id")
      .select("r").collect()
      .map(_.getSeq[Long](0).toArray)
    require(cb.nonEmpty, s"need at least one of the $k lowest ids present")
    for (_ <- 0 until iters) {
      val partials = assign(residuals, cb.toSeq.map(_.toSeq))
        .select(col("cell"), posexplode(col("r")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect() // bounded: k x d rows
      val next = cb.map(_.clone())
      partials.foreach { row =>
        val c = row.getLong(0).toInt
        val p = row.getInt(1)
        // truncating long division — toward zero on BOTH engines
        next(c)(p) = row.getLong(2) / row.getLong(3)
      }
      cb = next
    }
    cb
  }
}
