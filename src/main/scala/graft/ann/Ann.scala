package graft.ann

import graft.vec.Vec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

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
/** Cell scoring against a fixed centroid set — shared by IVF assignment,
  * probing, and k-means fitting. All `p` centroid dots run in ONE
  * imperative pass (PlaneDots); the vector norm is bound once via the
  * single-element-array transform (referencing it raw inside the
  * zip_with lambda would recompute it per centroid).
  */
private[ann] object Cells {

  /** cosine of v against every centroid, as an array<double> column. */
  def cellScores(v: Column, centroids: Seq[Seq[Double]]): Column = {
    val centroidNorms = typedLit(centroids.map(c => math.sqrt(c.map(x => x * x).sum)))
    val dots = graft.functions.exprs.plane_dots(v, centroids)
    val nvExpr = aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    element_at(
      transform(array(nvExpr), nv =>
        zip_with(dots, centroidNorms, (dt, cn) =>
          when(nv === 0.0, lit(-2.0)).otherwise(dt / (sqrt(nv) * cn)))),
      1)
  }

  /** index (0-based) of the best-scoring cell, ties to lower index */
  def bestCell(v: Column, centroids: Seq[Seq[Double]]): Column = {
    val scores = cellScores(v, centroids)
    element_at(
      transform(array(scores), s => array_position(s, array_max(s)) - 1), 1)
  }
}

object Ann {

  /** All-cells cosine scores for one vector against broadcast centroid
    * literals ([[Cells.cellScores]]) — exposed for cluster-geometry
    * diagnostics (the silhouette key) that need best AND second-best.
    */
  def cellScores(v: Column, centroids: Seq[Seq[Double]]): Column =
    Cells.cellScores(v, centroids)

  /** Reduce scored candidates to top-k per query via the two-phase
    * TopKPerKey operator (map-side partial heaps bound the shuffle at
    * queries x k x partitions rows — NOT the full scored corpus), then
    * rank the tiny survivor set with a window.
    */
  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.TopK.perKey(
      scored.select(col("query_id"), col("vec_id"), col("cosine")),
      Seq("query_id"),
      Seq("cosine" -> true, "vec_id" -> false),
      k)
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    top
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rnk"))
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

  /** Top-k by cosine over the int8-quantized vectors ([[graft.vec.Vec
    * .int8Normalize]]) — the approximate leg of `vec_int8_recall`: the
    * 4-bytes→1-byte storage shrink is only worth shipping if its
    * recall against float truth is measured. Same broadcast/one-scan
    * contract as [[bruteForceTopK]]; the int8 dot is exact int64 and
    * the single final division is deterministic cross-engine.
    */
  def int8TopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val q8 = embeddings.select(col("vec_id"),
      graft.vec.Vec.int8Normalize(col("embedding")).as("v8"))
    val q = q8.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("v8").as("qv"))
    val scored = q8
      .join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(graft.vec.Vec.cosineQ(col("qv"), col("v8")), 6).as("cosine"))
    rank(scored, k)
  }

  /** Top-k by cosine over per-dimension scalar-quantized (SQ8) vectors
    * — the third compression the recall table measures (int8 scales by
    * the vector's own norm; SQ8 scales each DIMENSION by the corpus
    * min/max, the classic FAISS-style SQ codec). Fit = one posexplode
    * groupBy to d (min, max) rows collected as bounded metadata (the
    * KMeans/centroid contract); corpus vectors encode to codes 0..255
    * and rescore against their RECONSTRUCTED values, symmetric on both
    * sides, so the stored index is genuinely 1 byte/dim. Encode and
    * reconstruct are exact integer expressions (code = (x−mn)·255 div
    * rg, rec = mn + code·rg div 255) riding the scan as codegen
    * literals; the only shuffle is the TopKPerKey reduction.
    */
  def sqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val qz = embeddings.select(col("vec_id"), Vec.quantize(col("embedding")).as("q"))
    // bounded d-row fit collect: per-dimension (min, range)
    val mm = qz.select(posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), math.max(r.getLong(2) - r.getLong(1), 1L)))
    val mnsSql = mm.map(_._1).mkString("array(", "L,", "L)")
    val rgsSql = mm.map(_._2).mkString("array(", "L,", "L)")
    val rec = qz.withColumn("v", expr(
      s"transform(sequence(1, size(q)), i -> element_at($mnsSql, i) + " +
        s"((element_at(q, i) - element_at($mnsSql, i)) * 255 div element_at($rgsSql, i))" +
        s" * element_at($rgsSql, i) div 255)"))
      .select(col("vec_id"), col("v"))
    val q = rec.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = rec
      .join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(Vec.cosineQ(col("qv"), col("v")), 6).as("cosine"))
    rank(scored, k)
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-k most-similar corpus vectors whose LABEL DIFFERS
    * from the query's own — the near-miss impostors a retrieval/
    * embedding model must learn to push away. Same plan shape as
    * [[bruteForceTopK]] (queries broadcast, corpus scanned once, no
    * corpus shuffle), with the label inequality riding the broadcast
    * join as an extra residual, so the mining pass costs exactly one
    * corpus scan regardless of label cardinality.
    */
  def hardNegativesTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val q = embeddings
      .where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        Vec.quantize(col("embedding")).as("qv"))
    val corpus = embeddings.select(col("vec_id"), col("label"),
      Vec.quantize(col("embedding")).as("cv"))
    val scored = corpus
      .join(broadcast(q),
        col("query_id") =!= col("vec_id") && col("qlabel") =!= col("label"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(Vec.cosineQ(col("qv"), col("cv")), 6).as("cosine"))
    rank(scored, k)
  }

  /** Per-cell prototype selection — the data-pruning representative
    * pick (SSL-prototypes / SemDedup-centroid construction): every
    * vector is assigned to its best cell and scored against THAT
    * centroid; the k most-central exemplars per cell survive.
    * Assignment and scoring are map-side expressions over broadcast
    * centroid literals (the corpus never shuffles to score); the only
    * exchange is the (cell)-keyed top-k reduction, bounded at
    * cells × k × partitions rows by TopKPerKey's partial heaps.
    * Scores are rounded to 6 decimals BEFORE ranking (the same
    * determinism contract as [[rank]]); ties break on vec_id.
    */
  def prototypesPerCell(embeddings: DataFrame, centroids: Seq[Seq[Double]], k: Int): DataFrame = {
    val scored = embeddings.select(
      col("vec_id"),
      Cells.bestCell(col("embedding"), centroids).as("cell"),
      round(array_max(Cells.cellScores(col("embedding"), centroids)), 6).as("cosine"))
    val top = graft.plans.TopK.perKey(
      scored, Seq("cell"), Seq("cosine" -> true, "vec_id" -> false), k)
    val w = Window.partitionBy(col("cell")).orderBy(col("cosine").desc, col("vec_id").asc)
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("cell"), col("vec_id"), col("cosine"), col("rnk"))
  }

  /** IVF (inverted-file) top-k: corpus is partitioned into cells around
    * centroid vectors; queries probe only the `nProbe` nearest cells.
    *
    * `centroids`: pass a fitted set (KMeans.fit / IvfIndex.load) — the
    * production path, where the index is built once and persisted as
    * metadata; `None` falls back to a deterministic sample (lowest
    * `nCentroids` vec_ids). Either way centroids are driver-collected
    * index metadata (O(C*d) small) broadcast as literals, so assignment
    * is a map-side expression — the corpus never shuffles.
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    val cents: Seq[Seq[Double]] = centroids.getOrElse {
      embeddings
        .where(col("vec_id") < nCentroids)
        .select(col("vec_id"), col("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
        .sortBy(_._1)
        .toSeq
        .map(_._2)
    }
    val nCells = cents.length

    val corpus = embeddings.select(
      col("vec_id"), Vec.quantize(col("embedding")).as("cv"),
      Cells.bestCell(col("embedding"), cents).as("cell"))

    // queries probe their nProbe best cells
    val qBase = embeddings.where(col("vec_id").isInCollection(queryIds))
    val qScored = qBase.select(
      col("vec_id").as("query_id"), Vec.quantize(col("embedding")).as("qv"),
      Cells.cellScores(col("embedding"), cents).as("scores"))
    val qProbes = qScored.select(
      col("query_id"), col("qv"),
      explode(slice(
        transform(
          array_sort(
            zip_with(col("scores"), sequence(lit(0), lit(nCells - 1)),
              (s, i) => struct((-s).as("neg"), i.as("idx")))),
          e => e.getField("idx")),
        1, nProbe)).as("cell"))

    val scored = corpus
      .join(broadcast(qProbes), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
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

  /** Multi-probe LSH top-k (Lv et al. 2007): the query probes its own
    * bucket PLUS the p buckets at Hamming distance 1 (one hyperplane
    * sign flipped) — the standard fix for single-probe LSH's recall
    * collapse (`ann_lsh_recall` measures 0–100‰ here; flipping the
    * least-confident planes recovers neighbors that straddle a
    * hyperplane). Candidates stay bucket-equi-joined (the probe set is
    * query metadata: |queries|·(p+1) rows riding one broadcast), the
    * corpus is bucketed once and never shuffles, and each corpus vector
    * can match at most ONE probe bucket per query (the flip targets are
    * distinct), so no dedup pass is needed.
    */
  def lshMultiprobeTopK(
      embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10, p: Int = 8): DataFrame = {
    val bucketed = embeddings.select(
      col("vec_id"),
      Vec.quantize(col("embedding")).as("cv"),
      Vec.lshBucket(col("embedding"), p).as("bucket"))
    val flips = typedLit(0L +: Seq.tabulate(p)(j => 1L << j))
    val probes = bucketed
      .where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("cv").as("qv"),
        explode(flips).as("flip"), col("bucket").as("qbucket"))
      .select(col("query_id"), col("qv"), expr("qbucket ^ flip").as("bucket"))
    val scored = bucketed
      .join(broadcast(probes), Seq("bucket"))
      .where(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"),
        col("vec_id"),
        round(Vec.cosineQ(col("qv"), col("cv")), 6).as("cosine"))
    rank(scored, k)
  }

  /** Approximate k-NN GRAPH: every vector's top-k cosine neighbors
    * among its LSH-bucket mates — the corpus-to-corpus self-join
    * (where lshTopK is queries-to-corpus) that feeds graph-based ANN
    * indexes, label propagation, and cluster diagnostics. Vectors
    * whose bucket holds no other member emit no rows (the LSH recall
    * contract, same as `ann_lsh_topk`).
    *
    * Scale: candidates are generated only WITHIN buckets (one shuffle
    * on the bucket key), scored with the exact quantized-integer
    * cosine, and reduced through the bounded-heap TopKPerKey operator —
    * per-task state corpus×k, never the full candidate set.
    */
  /** Greedy beam search over the k-NN GRAPH — the third ANN index
    * family (graph navigation, the HNSW/NSG base layer) next to the
    * cell-probe (IVF) and code-compression (PQ) families. The bucketed
    * [[knnGraph]] is a disjoint union of per-bucket components, so a
    * single global entry could never leave its own component; instead
    * the beam seeds from a COARSE ENTRY LAYER — one representative
    * (min vec_id) per LSH bucket, ≤2^p driver-held ids, the
    * DiskANN-medoid / HNSW-upper-layer role. Each hop expands the
    * current beam through its stored top-`nnK` out-edges, rescores
    * beam ∪ neighbors against the query (exact quantized cosine,
    * rounded to 6 before ranking), and keeps the best `k` per query —
    * so hop 1 doubles as the entry-layer scoring pass.
    *
    * Scale: the graph build is [[knnGraph]]'s bucketed self-join (built
    * once, shareable); each search hop is one equi-join of the
    * queries×k beam frame against the edge list plus one map-side
    * rescoring pass — per-hop work O(queries·(k+2^p)·nnK), independent
    * of corpus size, which is the entire point of graph ANN. Query
    * vectors ride into codegen as literals (bounded workload metadata,
    * the lshTopK broadcast contract).
    */
  def graphSearch(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      hops: Int = 3,
      nnK: Int = 5,
      p: Int = 8,
      graph0: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && hops >= 1, s"graphSearch: need k, hops >= 1; got $k, $hops")
    val spark = embeddings.sparkSession
    import spark.implicits._
    // graph0 = a prebuilt (persisted-index) kNN graph: in production the
    // graph is built once and every search loads it — the build-once
    // lifecycle PQ/IVF already follow. Absent, build it here.
    val graph = graph0.getOrElse(knnGraph(embeddings, nnK, p))
    val edges = graph.select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val corpusB = embeddings.select(
      col("vec_id"),
      Vec.quantize(col("embedding")).as("cv"),
      Vec.lshBucket(col("embedding"), p).as("bucket"))
    val corpus = corpusB.select("vec_id", "cv")
    val qvecs: Seq[(Long, Seq[Long])] = corpus
      .where(col("vec_id").isInCollection(queryIds))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toSeq.sortBy(_._1)
    require(qvecs.nonEmpty, "graphSearch: no query vectors found")
    // coarse entry layer: bounded at 2^p ids — index metadata, not data
    val repIds: Seq[Long] = corpusB.groupBy("bucket")
      .agg(min(col("vec_id")).as("v"))
      .select("v").collect().map(_.getLong(0)).toSeq.sorted
    // per-query cosine vs the bound query literal, lshTopK conventions
    val score = qvecs.foldLeft(lit(Double.NaN)) { case (els, (qid, qv)) =>
      when(col("query_id") === qid,
        round(Vec.cosineQ(typedLit(qv), col("cv")), 6)).otherwise(els)
    }
    var beam = (for { (qid, _) <- qvecs; r <- repIds } yield (qid, r))
      .toDF("query_id", "vec_id")
    var beamScored: DataFrame = null
    for (_ <- 1 to hops) {
      val expanded = beam.join(edges, beam("vec_id") === edges("src"))
        .select(col("query_id"), col("dst").as("vec_id"))
      val cand = beam.unionByName(expanded).distinct()
      val scored = cand.join(corpus, "vec_id")
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), score.as("cosine"))
      beamScored = graft.plans.TopK.perKey(
        scored, Seq("query_id"), Seq("cosine" -> true, "vec_id" -> false), k)
      beam = beamScored.select("query_id", "vec_id")
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val out = beamScored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rnk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize while the graph is cached; caller owns out
    // Release only a graph WE built: a caller-supplied graph0 is a shared
    // persisted-index artifact whose cache lifecycle the caller owns —
    // unpersisting it here would silently evict it after the first search.
    if (graph0.isEmpty) graph.unpersist(blocking = false)
    out
  }

  /** Binary quantization: the 64-d vector collapses to ONE 64-bit word
    * (bit i = quantized coordinate i positive) — 256× smaller than
    * float32, the most aggressive compression tier (below PQ's 16×) in
    * the modern vector-DB stack. Sign bits of zero-mean embeddings
    * preserve angular locality (the same fact 1-bit SimHash exploits),
    * so Hamming distance on the packed words is a cheap cosine proxy
    * for candidate generation, rescored exactly afterwards.
    */
  def signPack(embeddings: DataFrame): DataFrame =
    // r15: fused one-pass kernel — the compositional pair of aggregates
    // built a 64-element sequence array, probed it with per-index
    // element_at, and walked the quantized vector twice (R15OptSpec pins
    // bit-equality incl. null-element and sub-64-dim edges)
    embeddings
      .select(col("vec_id"),
        graft.functions.vexprs.sign_pack(Vec.quantize(col("embedding"))).as("sp"))
      .select(col("vec_id"),
        col("sp.bits").as("bits"), col("sp.n_pos").as("n_pos"))

  /** Hamming-distance top-k over the packed sign bits — the fourth ANN
    * family (binary quantization) beside brute-force, IVF/LSH cell
    * probing, PQ codes and graph navigation. One xor + popcount per
    * candidate (codegen'd integer ops, no arrays touched); queries ride
    * a broadcast like [[bruteForceTopK]], the corpus never shuffles.
    */
  def hammingTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val packed = signPack(embeddings).select(col("vec_id"), col("bits"))
    val q = packed.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("bits").as("qbits"))
    val scored = packed.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        expr("CAST(bit_count(qbits ^ bits) AS BIGINT)").as("hamming"))
    val top = graft.plans.TopK.perKey(
      scored, Seq("query_id"), Seq("hamming" -> false, "vec_id" -> false), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
    top.withColumn("rnk", row_number().over(w).cast("long"))
  }

  def knnGraph(embeddings: DataFrame, k: Int = 5, p: Int = 8): DataFrame = {
    require(k >= 1, s"knnGraph: need k >= 1, got $k")
    val b = embeddings.select(
      col("vec_id"),
      Vec.quantize(col("embedding")).as("q"),
      Vec.lshBucket(col("embedding"), p).as("bucket"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = b.as("l").join(b.as("r"), Seq("bucket"))
      .where(col("l.vec_id") =!= col("r.vec_id"))
      .select(
        col("l.vec_id").as("vec_id"),
        col("r.vec_id").as("nbr_id"),
        Vec.cosineQ(col("l.q"), col("r.q")).as("cosine"))
    val top = graft.plans.TopK.perKey(
      cand, Seq("vec_id"), Seq("cosine" -> true, "nbr_id" -> false), k)
    val w = Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val out = top
      .withColumn("rnk", row_number().over(w).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize while b is cached; caller owns `out`
    b.unpersist(blocking = false)
    out
  }

  /** Per-cell membership counts of `df` against FIXED centroids — the
    * index-occupancy read behind IVF maintenance (cell skew, delta
    * absorption). Pure map-side assignment (centroids are codegen
    * literals, same plan as the probe path) + one bounded groupBy;
    * `countName` labels the count column so base/delta histograms can
    * full-outer-join without renames.
    */
  def cellHistogram(
      df: DataFrame,
      centroids: Seq[Seq[Double]],
      countName: String,
      vecCol: String = "embedding"): DataFrame =
    df.select(Cells.bestCell(col(vecCol), centroids).cast("long").as("cell"))
      .groupBy("cell").agg(count(lit(1)).as(countName))

  /** `(vec_id, cell)` — per-row best-cell assignment against the
    * centroid literals (map-side, ties to the lower cell index; the
    * same total order as the IVF fit oracles' row_number).
    */
  def assignCells(
      df: DataFrame,
      centroids: Seq[Seq[Double]],
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame =
    df.select(col(idCol), Cells.bestCell(col(vecCol), centroids).cast("long").as("cell"))

  /** The exact cell-assignment COLUMN [[assignCells]] projects — exposed
    * (r14) so callers that also need other map-side derivations of the
    * same row (quantized vector, residual) can ride ONE projection
    * instead of a vec_id self-join against the assignment frame.
    */
  def bestCellCol(v: Column, centroids: Seq[Seq[Double]]): Column =
    Cells.bestCell(v, centroids).cast("long")

  /** Per-cell index-quality report: occupancy, mean cosine COHESION to
    * the owning centroid, and mean MARGIN over the second-best centroid
    * (both in truncated µ-units) — the k-picker's read: low cohesion =
    * cell too broad (raise k), low margin = cells overlap (probes must
    * widen). One map-side cellScores pass per vector (the corpus never
    * shuffles raw vectors); own/second fall out of one array sort over
    * the k-length score vector, then a bounded k-row aggregate.
    */
  def cellQuality(
      df: DataFrame,
      centroids: Seq[Seq[Double]],
      vecCol: String = "embedding"): DataFrame = {
    val scores = Cells.cellScores(col(vecCol), centroids)
    // (−score, cell) struct sort = score DESC, cell ASC — the same
    // total order as the oracle's row_number, ties to the lower cell
    val ranked = sort_array(zip_with(
      scores,
      sequence(lit(0L), lit((centroids.size - 1).toLong)),
      (sc, i) => struct((-sc).as("ns"), i.as("cell"), sc.as("sc"))))
    df
      .select(element_at(ranked, 1).as("own"), element_at(ranked, 2).as("snd"))
      .select(col("own.cell").as("cell"),
        expr("cast(own.sc * 1e6 as bigint)").as("own_u6"),
        expr("cast((own.sc - snd.sc) * 1e6 as bigint)").as("margin_u6"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"),
        expr("sum(own_u6) div count(1)").as("avg_cohesion_u6"),
        expr("sum(margin_u6) div count(1)").as("avg_margin_u6"))
      .orderBy("cell")
  }
}
