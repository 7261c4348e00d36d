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
    val (codes, cb) = encode(emb, cents, kCodes)
    probeCodes(emb, codes, cents, cb, queryIds, k, nProbe)
  }

  /** Encode the corpus against fitted coarse centroids: fit the residual
    * codebook and return the `(vec_id, cell, rq_cell)` code table plus the
    * codebook — the compressed representation a persisted [[Index]] stores.
    */
  private def encode(
      emb: DataFrame,
      cents: Seq[Seq[Double]],
      kCodes: Int): (DataFrame, Seq[Seq[Long]]) = {
    // r14 (guide §2.4): the cell assignment, the quantized vector, and
    // the residual are all MAP-SIDE expressions over the same row, so
    // deriving them in one projection removes the two vec_id self-joins
    // the old shape paid (q ⋈ assigned to build residuals, then
    // assigned ⋈ rq to assemble the code table — exchanges of the corpus
    // for zero information). Same cell expression (Ann.assignCells'
    // Cells.bestCell cast long), same residual arithmetic, same
    // Rq.assign argmin — the code table is bit-identical (R14OptSpec
    // pins the probe output against the oracle-gated keys).
    val qcLit = typedLit(milliQuant(cents))
    // two-step projection binds the cell assignment once per row (the
    // single-use alias collapses back into one map stage; the twice-used
    // `cell` does not re-inline)
    val residuals = emb
      .select(col("vec_id"), Vec.quantize(col("embedding")).as("q"),
        Cells.bestCell(col("embedding"), cents).cast("long").as("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("q"), element_at(qcLit, col("cell").cast("int") + 1),
          (x, y) => x - y).as("r"))
    val cb = Rq.fit(residuals.select("vec_id", "r"), kCodes, iters = 1).toSeq.map(_.toSeq)
    val codes = residuals
      .select(col("vec_id"), col("cell"), Rq.l2Dists(col("r"), cb).as("ds"))
      .select(col("vec_id"), col("cell"),
        (array_position(col("ds"), array_min(col("ds"))) - 1).cast("long").as("rq_cell"))
    (codes, cb)
  }

  /** The probe path shared by [[topK]] (in-flight fit) and [[Index.probe]]
    * (persisted code table): candidates from each query's top-nProbe cells
    * are scored by exact-integer L2 against the reconstruction
    * (centroid + residual codeword, both bounded literals). The corpus'
    * code table never shuffles — probes (queries × nProbe rows) broadcast
    * onto its cell key.
    */
  private[ann] def probeCodes(
      emb: DataFrame,
      codes: DataFrame,
      cents: Seq[Seq[Double]],
      cb: Seq[Seq[Long]],
      queryIds: Seq[Long],
      k: Int,
      nProbe: Int): DataFrame = {
    val qcLit = typedLit(milliQuant(cents))
    val cbLit = typedLit(cb)
    // reconstruction = coarse centroid + residual codeword (both literals)
    val recon = codes.select(col("vec_id"), col("cell"),
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
    val cand = probes.join(recon, "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "v")
    val qv = emb.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), Vec.quantize(col("embedding")).as("qv"))
    val scored = cand.join(qv, "query_id")
      .select(col("query_id"), col("vec_id"),
        // fused integer L2 (r14): one pass per candidate instead of
        // aggregate(zip_with(...))'s intermediate array; bit-identical
        graft.functions.vexprs.sq_dist_q(col("qv"), col("v")).as("adist"))
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("query_id", "vec_id", "adist", "rnk")
      .orderBy("query_id", "rnk")
  }

  /** Persisted IVF-RQ index — the production lifecycle the fit+probe
    * [[topK]] can't demonstrate: fit + encode ONCE (corpus compresses to
    * two small ints per vector + two bounded codebooks), then every probe
    * loads the codebooks (bounded collects) and scans only the code
    * table — no k-means, no residual fit, no raw-vector reread. Same
    * build-once pattern as [[IvfIndex]] / [[Pq.Index]].
    */
  object Index {

    def build(
        emb: DataFrame,
        path: String,
        kCells: Int = 16,
        kCodes: Int = 16): Unit = {
      val spark = emb.sparkSession
      import spark.implicits._
      val cents = KMeans.fit(emb, kCells, iters = 1).toSeq.map(_.toSeq)
      cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      val (codes, cb) = encode(emb, cents, kCodes)
      cb.zipWithIndex.map { case (c, i) => (i.toLong, c) }
        .toDF("code", "codeword")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
      codes.write.mode("overwrite").parquet(s"$path/codes")
    }

    def loadCentroids(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Seq[Double]] =
      spark.read.parquet(s"$path/centroids").orderBy("cell")
        .collect().map(_.getSeq[Double](1).toSeq).toSeq

    def loadCodebook(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Seq[Long]] =
      spark.read.parquet(s"$path/codebook").orderBy("code")
        .collect().map(_.getSeq[Long](1).toSeq).toSeq

    /** Probe-only top-k against a built index: output-identical to
      * [[topK]] at the same parameters (the fits are deterministic), but
      * the per-call work is just codebook loads + one code-table scan.
      */
    def probe(
        spark: org.apache.spark.sql.SparkSession,
        path: String,
        emb: DataFrame,
        queryIds: Seq[Long],
        k: Int = 10,
        nProbe: Int = 2): DataFrame =
      probeCodes(emb, spark.read.parquet(s"$path/codes"),
        loadCentroids(spark, path), loadCodebook(spark, path), queryIds, k, nProbe)
  }
}
