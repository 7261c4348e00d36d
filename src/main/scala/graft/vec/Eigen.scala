package graft.vec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed power iteration for the top principal direction of an
  * embedding corpus — the PCA primitive behind whitening, anisotropy
  * diagnostics ("is the embedding space collapsing?"), and 1-D
  * projection indexes.
  *
  * All-INTEGER fixed point, so the result is bit-identical in any
  * engine: vectors are int8-normalized ([[Vec.int8Normalize]], exact),
  * the iterate v is held at max-norm `scaleMax` as longs, and one
  * iteration is
  *
  *   s_i   = Σ_j q_ij · v_j            (exact per-row dot)
  *   acc_j = Σ_i q_ij · s_i            (exact, order-free integer sums)
  *   v'_j  = (acc_j · scaleMax) quot max_k |acc_k|   (trunc division)
  *
  * i.e. v' ∝ (QᵀQ) v — the Gram-matrix power step — with a max-norm
  * rescale instead of L2 so no sqrt enters the integer path. Trunc
  * (toward-zero) division is mirrored in the oracle as
  * sign(x)·(|x|·scaleMax // m).
  *
  * Scale: each iteration is ONE scan of the cached quantized corpus —
  * s_i is map-side, acc is d running `sum` aggregates with map-side
  * partial combine (no explode, no wide shuffle; the reduce moves
  * d values per partition). Driver state per iteration is the d-vector
  * acc — bounded index metadata, the same contract as the KMeans
  * centroid collect. Overflow bound: |acc_j| ≤ n · 127 · d · 127 ·
  * scaleMax, safe in Int64 for n up to ~2^30 rows at d=64,
  * scaleMax=4096; beyond that, shard the corpus and average directions.
  */
object Eigen {

  /** One Gram power step per iteration over the cached quantized corpus;
    * `orthoTo = Some(v1)` applies exact-integer projection deflation
    * AFTER each step's max-norm rescale:
    *
    *   w'_j = w_j·(v1·v1) − (v1·w)·v1_j
    *
    * — a pure integer cross-multiplication (no division until the final
    * rescale), so the deflated iterate is bit-exact in any engine.
    * Bounds: |w| ≤ scaleMax, v1·v1 ≤ d·scaleMax², so |w'| ≤
    * 2·d·scaleMax³ ≈ 2^45 at d=64, scaleMax=4096 — safely in Int64.
    */
  private def powerSteps(
      q8: DataFrame,
      d: Int,
      iters: Int,
      scaleMax: Long,
      orthoTo: Option[Array[Long]]): Array[Long] = {
    def rescale(a: Array[Long]): Array[Long] = {
      val m = math.max(a.map(math.abs).max, 1L)
      a.map(x => x * scaleMax / m) // Long division: trunc toward zero
    }
    var v = Array.fill(d)(1L)
    for (_ <- 1 to iters) {
      val vl = typedLit(v.toSeq)
      val s = aggregate(
        zip_with(col("q"), vl, (x, y) => x * y), lit(0L), (a, b) => a + b)
      val withS = q8.select(col("q"), s.as("s"))
      val accRow = withS.agg(
        sum(element_at(col("q"), 1) * col("s")).as("a0"),
        (1 until d).map(j =>
          sum(element_at(col("q"), j + 1) * col("s")).as(s"a$j")): _*)
        .head()
      val acc = Array.tabulate(d)(j =>
        if (accRow.isNullAt(j)) 0L else accRow.getLong(j))
      v = orthoTo match {
        case None => rescale(acc)
        case Some(v1) =>
          val w = rescale(acc)
          val n1 = v1.map(x => x * x).sum
          val ip = v1.zip(w).map { case (a, b) => a * b }.sum
          rescale(w.zip(v1).map { case (wj, v1j) => wj * n1 - ip * v1j })
      }
    }
    v
  }

  def topDirection(
      embeddings: DataFrame,
      iters: Int = 3,
      scaleMax: Long = 4096L): DataFrame = {
    require(iters >= 1, s"topDirection: need iters >= 1, got $iters")
    require(scaleMax >= 2L && scaleMax <= (1L << 20),
      s"topDirection: scaleMax out of range: $scaleMax")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val d = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(d >= 1, "topDirection: empty embedding vector")

    val q8 = embeddings.select(Vec.int8Normalize(col("embedding")).as("q"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val v = powerSteps(q8, d, iters, scaleMax, orthoTo = None)
      v.zipWithIndex.map { case (x, j) => (j.toLong, x) }.toSeq
        .toDF("dim", "v_q")
    } finally { q8.unpersist(); () }
  }

  /** 2-D PCA projection of every vector: fit the [[top2Basis]] integer
    * basis, then one MAP-SIDE pass computes each vector's exact integer
    * dot with v1 and v2 (the basis rides into codegen as literals) —
    * the embedding-space map/whitening step downstream tools consume.
    * p ≤ d·127·scaleMax ≈ 2^35 at d=64 — exact in Int64. Output
    * (vec_id, p1_q, p2_q); corpus never shuffles.
    */
  def project2(
      embeddings: DataFrame,
      iters: Int = 3,
      scaleMax: Long = 4096L): DataFrame = {
    require(iters >= 1, s"project2: need iters >= 1, got $iters")
    val d = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(d >= 1, "project2: empty embedding vector")
    val q8 = embeddings
      .select(col("vec_id"), Vec.int8Normalize(col("embedding")).as("q"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val v1 = powerSteps(q8, d, iters, scaleMax, orthoTo = None)
      val v2 = powerSteps(q8, d, iters, scaleMax, orthoTo = Some(v1))
      def dot(v: Array[Long]) = aggregate(
        zip_with(col("q"), typedLit(v.toSeq), (x, y) => x * y),
        lit(0L), (a, b) => a + b)
      // lazy result re-derives q8's lineage after the unpersist below —
      // one extra map-side normalize pass, no cached-state leak
      q8.select(col("vec_id"), dot(v1).as("p1_q"), dot(v2).as("p2_q"))
    } finally { q8.unpersist(blocking = false); () }
  }

  /** Mean per-vector energy share captured by the top-2 basis — the
    * "is 2-D enough?" diagnostic read before trusting [[project2]]
    * coordinates for clustering/visualization. Per vector i the share
    * along v is (q_i·v)²·1000 div (|q_i|²·|v|²) in exact integer
    * permille (p ≤ d·127·scaleMax ≈ 2^25 at d=64, so p²·1000 ≤ 2^60;
    * denominator |q|²·|v|² ≤ 2^20·2^30 = 2^50 — all in Int64);
    * the published row is the corpus mean of the two shares (truncating
    * division both engines). One map-side pass over the fitted basis
    * literals; output 1×3 — n_vecs, avg_v1_share_pml, avg_v2_share_pml.
    */
  def explained2(
      embeddings: DataFrame,
      iters: Int = 3,
      scaleMax: Long = 4096L): DataFrame = {
    require(iters >= 1, s"explained2: need iters >= 1, got $iters")
    val d = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(d >= 1, "explained2: empty embedding vector")
    val q8 = embeddings
      .select(col("vec_id"), Vec.int8Normalize(col("embedding")).as("q"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val v1 = powerSteps(q8, d, iters, scaleMax, orthoTo = None)
      val v2 = powerSteps(q8, d, iters, scaleMax, orthoTo = Some(v1))
      val vv1 = v1.map(x => x * x).sum
      val vv2 = v2.map(x => x * x).sum
      def dot(v: Array[Long]) = aggregate(
        zip_with(col("q"), typedLit(v.toSeq), (x, y) => x * y),
        lit(0L), (a, b) => a + b)
      val nq = aggregate(zip_with(col("q"), col("q"), (x, y) => x * y),
        lit(0L), (a, b) => a + b)
      q8.select(dot(v1).as("p1"), dot(v2).as("p2"), nq.as("nq"))
        .select(
          expr(s"CASE WHEN nq = 0 THEN 0L ELSE p1 * p1 * 1000L div (nq * ${vv1}L) END").as("s1"),
          expr(s"CASE WHEN nq = 0 THEN 0L ELSE p2 * p2 * 1000L div (nq * ${vv2}L) END").as("s2"))
        .agg(count(lit(1)).as("n_vecs"), sum("s1").as("t1"), sum("s2").as("t2"))
        .select(col("n_vecs"),
          expr("t1 div n_vecs").as("avg_v1_share_pml"),
          expr("t2 div n_vecs").as("avg_v2_share_pml"))
    } finally { q8.unpersist(blocking = false); () }
  }

  /** Top-2 principal basis: v1 by plain power iteration, v2 by the same
    * iteration with per-step exact-integer projection deflation against
    * v1 (see [[powerSteps]]). Output (dim, v1_q, v2_q) — the 2-D PCA
    * projection basis for embedding-space maps and anisotropy checks.
    * Cost: 2·iters corpus scans, each d map-side-combined integer sums;
    * driver state = two d-vectors.
    */
  def top2Basis(
      embeddings: DataFrame,
      iters: Int = 3,
      scaleMax: Long = 4096L): DataFrame = {
    require(iters >= 1, s"top2Basis: need iters >= 1, got $iters")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val d = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(d >= 1, "top2Basis: empty embedding vector")

    val q8 = embeddings.select(Vec.int8Normalize(col("embedding")).as("q"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val v1 = powerSteps(q8, d, iters, scaleMax, orthoTo = None)
      val v2 = powerSteps(q8, d, iters, scaleMax, orthoTo = Some(v1))
      (0 until d).map(j => (j.toLong, v1(j), v2(j))).toSeq
        .toDF("dim", "v1_q", "v2_q")
    } finally { q8.unpersist(); () }
  }
}
