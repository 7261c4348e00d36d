package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product-quantization (PQ) ANN — the memory-compression scale path:
  * each 64-dim float vector compresses to m=8 4-bit-ish codes (one
  * byte-sized int per 8-dim subspace), a 16× shrink, and queries score
  * candidates with asymmetric distance computation (ADC): per query a
  * tiny lookup table lut[s][c] = <q_s, codebook[s][c]> is precomputed,
  * so scoring a vector is m table lookups + integer adds — no float
  * math per candidate at probe time.
  *
  * Scale shape: the codebook is index metadata (m×k×dsub doubles,
  * driver-built like a k-means IVF index); codes and scores are
  * strictly MAP-SIDE (codebook and luts ride as codegen array
  * literals); per-query scores explode map-side and reduce through the
  * bounded-heap TopKPerKey operator — the corpus never shuffles, the
  * only exchange is keys×k×partitions heap survivors.
  *
  * Determinism/oracle: sub-distances and lut dots fold in ascending
  * dim order in double (bit-reproducible, mirrored by list_reduce in
  * SQL); lut values truncate to integer micro-units so per-candidate
  * score sums are order-independent — the DuckDB oracle reproduces
  * codes, luts, and scores exactly.
  *
  * The codebook is FIT per subspace with [[KMeans.fit]] (deterministic
  * lowest-k init + one Lloyd iteration in integer micro-units — the same
  * reproducible fit the IVF index build uses), so the oracle unrolls the
  * per-subspace fit into chained CTEs exactly like ann_ivf_kmeans.
  *
  * Objective note: KMeans.fit ASSIGNS by cosine (spherical k-means,
  * shared with the IVF path for oracle parity), while PQ encoding and
  * ADC use L2² argmin — the fit optimizes a related but different
  * objective, so "fitted beats the sampled init on quantization error"
  * (asserted by PqSpec) is an empirical property of the corpus, not a
  * guarantee by construction. Acceptable: PQ recall degrades gracefully
  * with codebook quality, and reproducibility is the binding contract.
  */
object Pq {

  val m = 8      // subspaces
  val dsub = 8   // dims per subspace (m * dsub = embedding dim)
  val kCent = 16 // centroids per subspace

  /** Per-subspace k-means codebook: subspace s is fit over the corpus'
    * dsub-dim sub-vectors. The base frame is cached once so the m
    * sub-fits scan memory, not parquet; a one-time index build cost
    * (amortized over every probe job, like the IVF centroid fit).
    */
  def fittedCodebook(embeddings: DataFrame): Array[Array[Array[Double]]] = {
    // r14: the m per-subspace KMeans.fit(iters = 1) calls each paid an
    // init collect + an assignment/update job over the SAME corpus —
    // 2m+1 jobs and m full scans. The fused fit runs the identical
    // lowest-kCent init + one Lloyd step for ALL m subspaces in ONE init
    // collect + ONE scan: per row, each subspace's cosine cell assignment
    // (same Cells.bestCell expression over the same slice) tags its
    // sub-vector, and the (s, cell, pos) integer-µ partial sums — the
    // bit-reproducible KMeans update contract — ride a single bounded
    // aggregate. Per-subspace sums/counts are unchanged, so every
    // centroid (and thus codes/luts/scores) is bit-identical to the
    // sequential fit (pinned by R14OptSpec; the oracle CTE unroll and
    // the PqSpec round-trips are unchanged).
    val initRows = embeddings.where(col("vec_id") < kCent).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // the sampledCodebook guards, kept verbatim in spirit: a corpus
    // missing the kCent lowest vec_ids — or with embeddings not of
    // m*dsub dims — must fail HERE with a clear message, not later as an
    // ArrayIndexOutOfBounds in codes()
    require(initRows.length == kCent,
      s"fit init returned ${initRows.length} centroids, need $kCent " +
        s"(the $kCent lowest vec_ids must be present)")
    // >= not ==: the pre-r14 slice-based fit accepted wider embeddings
    // (extra dims beyond m*dsub are ignored by every slice), and
    // PqEncode/slice still tolerate them — keep that accepted-input set
    require(initRows.forall(_.length >= m * dsub),
      s"centroid dims < ${m * dsub} — embeddings must have at least ${m * dsub} dims")
    val cb0: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => initRows.map(_.slice(s * dsub, s * dsub + dsub)))
    val tagged = (0 until m).map { s =>
      val sub = slice(col("embedding"), s * dsub + 1, dsub)
      struct(lit(s).as("s"),
        Cells.bestCell(sub, cb0(s).toSeq.map(_.toSeq)).as("cell"),
        sub.as("v"))
    }
    val partials = embeddings
      .select(explode(array(tagged: _*)).as("t"))
      .select(col("t.s").as("s"), col("t.cell").as("cell"),
        posexplode(col("t.v")).as(Seq("pos", "x")))
      .groupBy("s", "cell", "pos")
      .agg(
        // truncating cast, not round(): the KMeans.fit update contract
        sum(expr("CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT)")).as("sm"),
        count(lit(1)).as("n"))
      .collect() // bounded: m x kCent x dsub rows
    val next = cb0.map(_.map(_.clone()))
    partials.foreach { r =>
      val s = r.getInt(0)
      val c = r.getAs[Number](1).intValue()
      val p = r.getInt(2)
      val n = r.getLong(4)
      if (n > 0) next(s)(c)(p) = r.getLong(3).toDouble / (1e6 * n)
    }
    next // empty cells keep their init centroid, like KMeans.fit
  }

  /** Deterministic unfit baseline — sub-vectors of the k lowest vec_ids.
    * Kept as the fit's init (KMeans.fit starts here) and as the spec's
    * quantization-error yardstick: the fitted codebook must beat it.
    */
  def sampledCodebook(embeddings: DataFrame): Array[Array[Array[Double]]] = {
    val rows = embeddings.where(col("vec_id") < kCent).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(rows.length == kCent, s"need the $kCent lowest vec_ids present, got ${rows.length}")
    require(rows.forall(_.length == m * dsub), s"expected ${m * dsub}-dim embeddings")
    Array.tabulate(m)(s => rows.map(_.slice(s * dsub, s * dsub + dsub)))
  }

  /** PQ codes of vector column `v`: array<int> of length m;
    * code_s = argmin_c L2²(v_s, codebook(s)(c)), ties to lowest c.
    */
  def codes(v: Column, cb: Array[Array[Array[Double]]]): Column =
    // fused one-row kernel (r14): the compositional form built m×kCent
    // aggregate(zip_with(slice(v), centroid)) sub-distance expressions —
    // 128 array walks + allocations per row at the default geometry.
    // Bit-identical L2² folds and first-minimum tie-break (R14OptSpec).
    graft.functions.vexprs.pq_encode(v, cb.map(_.map(_.toSeq).toSeq).toSeq)

  /** Per-subspace quantization distortion — the compression-quality
    * monitor (distortion drift means the codebook no longer fits the
    * corpus and the index needs a re-fit): for every vector and
    * subspace, the L2² to its NEAREST centroid (exactly the quantity
    * PQ encoding minimizes), truncated to µ-units per (vector,
    * subspace) BEFORE aggregation so the published means/maxes are
    * order-independent integers. Map-side against codebook literals;
    * one bounded (m rows) aggregate out.
    */
  def distortion(embeddings: DataFrame, cb: Array[Array[Array[Double]]]): DataFrame = {
    // fused one-row kernel (r14, see [[codes]]): all m nearest-centroid
    // L2² minima in one pass, µ-truncated exactly like the compositional
    // (array_min(dists) * 1e6).cast("long") form it replaces
    embeddings
      .select(col("vec_id"),
        posexplode(graft.functions.vexprs.pq_min_dist_u6(
          col("embedding"), cb.map(_.map(_.toSeq).toSeq).toSeq)).as(Seq("pos", "dist_u6")))
      .select(col("pos").cast("long").as("s"), col("dist_u6"))
      .groupBy("s")
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(dist_u6) div count(1)").as("mean_dist_u6"),
        max("dist_u6").as("max_dist_u6"))
      .orderBy("s")
  }

  /** ADC lookup table for query vector `q` (flat, lut(s*kCent+c)):
    * integer micro-units of <q_s, codebook(s)(c)>, ascending-dim fold.
    */
  def lut(q: Array[Double], cb: Array[Array[Array[Double]]]): Array[Long] =
    Array.tabulate(m * kCent) { i =>
      val s = i / kCent
      val c = i % kCent
      var acc = 0.0
      var j = 0
      while (j < dsub) { acc += q(s * dsub + j) * cb(s)(c)(j); j += 1 }
      (acc * 1e6).toLong
    }

  /** Top-k per query by ADC score over PQ codes. Output:
    * (query_id, vec_id, score_micro, rnk).
    */
  def adcTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val cb = fittedCodebook(embeddings)
    val coded = embeddings.select(col("vec_id"), codes(col("embedding"), cb).as("codes"))
    scoreCodes(coded, cb, collectQueries(embeddings, queryIds), k)
  }

  private def collectQueries(embeddings: DataFrame, queryIds: Seq[Long]): Array[(Long, Array[Double])] =
    embeddings.where(col("vec_id").isInCollection(queryIds))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  /** Queries per scoring chunk: the per-query explode multiplies each
    * scanned corpus row by the chunk's query count, and every query adds
    * a m*kCent-long lut literal to the projection's codegen — both must
    * stay bounded no matter how many queries a probe batch carries.
    */
  val queryChunkSize = 128

  /** ADC scoring over an already-encoded corpus `coded(vec_id, codes)` —
    * the probe path a persisted [[Index]] serves without refitting or
    * re-encoding.
    *
    * Queries are scored in chunks of `queryChunk` and the per-chunk
    * top-k unioned (query_ids are disjoint across chunks, so chunked
    * output is identical to unchunked): map-side fanout and codegen
    * size are bounded by the chunk, not the probe-batch size — a 10k-
    * query probe runs 10k/queryChunk bounded scans of the (16×-
    * compressed) code table instead of one scan with a 10k-wide explode.
    */
  def scoreCodes(
      coded: DataFrame,
      cb: Array[Array[Array[Double]]],
      qRows: Array[(Long, Array[Double])],
      k: Int,
      queryChunk: Int = queryChunkSize): DataFrame = {
    require(qRows.nonEmpty, "scoreCodes needs at least one query")
    require(queryChunk > 0, s"queryChunk must be positive, got $queryChunk")
    val chunkTops = qRows.grouped(queryChunk).map { chunk =>
      val scoreStructs = chunk.map { case (qid, q) =>
        // fused ADC sum (r14): one m-step lookup loop per (row, query)
        // instead of aggregate(zip_with(codes, sequence, element_at))'s
        // per-call array builds; identical sums and null contract
        val sc = graft.functions.vexprs.adc_score(col("codes"), lut(q, cb).toSeq, kCent)
        struct(lit(qid).as("query_id"), sc.as("score_micro"))
      }
      val scored = coded
        .select(col("vec_id"), explode(array(scoreStructs.toIndexedSeq: _*)).as("qs"))
        .select(col("qs.query_id").as("query_id"), col("vec_id"), col("qs.score_micro").as("score_micro"))
        .where(col("query_id") =!= col("vec_id"))
      graft.plans.TopK.perKey(
        scored, Seq("query_id"), Seq("score_micro" -> true, "vec_id" -> false), k)
    }.toSeq
    val top = chunkTops.reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score_micro").desc, col("vec_id").asc)
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("query_id"), col("vec_id"), col("score_micro"), col("rnk"))
  }

  /** Persisted PQ index — the 100 TB lifecycle: fit + encode ONCE
    * (16× compression of the corpus), probes load 4-byte-ish codes and
    * score without touching raw vectors again (same build-once pattern
    * as [[IvfIndex]]).
    */
  object Index {

    def build(embeddings: DataFrame, path: String): Array[Array[Array[Double]]] = {
      val spark = embeddings.sparkSession
      import spark.implicits._
      val cb = fittedCodebook(embeddings)
      cb.zipWithIndex.flatMap { case (cents, s) =>
        cents.zipWithIndex.map { case (e, c) => (s, c, e.toSeq) }
      }.toSeq.toDF("s", "c", "e")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
      embeddings.select(col("vec_id"), codes(col("embedding"), cb).as("codes"))
        .write.mode("overwrite").parquet(s"$path/codes")
      cb
    }

    def loadCodebook(spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Array[Double]]] = {
      val rows = spark.read.parquet(s"$path/codebook").orderBy("s", "c").collect()
      Array.tabulate(m) { s =>
        rows.filter(_.getInt(0) == s).sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }
    }

    def loadCodes(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
      spark.read.parquet(s"$path/codes")

    /** Probe the persisted index: queries come as raw vectors (they are
      * tiny), the corpus side is codes-only.
      */
    def topK(spark: org.apache.spark.sql.SparkSession, path: String,
             queries: Array[(Long, Array[Double])], k: Int = 10): DataFrame =
      scoreCodes(loadCodes(spark, path), loadCodebook(spark, path), queries.sortBy(_._1), k)
  }

  /** DuckDB oracle for [[adcTopK]] (fit, codes, luts, scores bit-exact).
    * The per-subspace KMeans fit is unrolled into chained CTEs exactly
    * like the validated ann_ivf_kmeans oracle: lowest-kCent init (cb0),
    * one Lloyd iteration — cosine assignment with ascending-dim left
    * folds (sc0/a0), integer-micro-unit mean update with trunc()
    * mirroring Spark's truncating CAST (ex/upd/cb1), empty cells keeping
    * their init centroid via the LEFT JOIN coalesce — then the ADC tail
    * (codes by L2² argmin, lut dots, score sums) against cb1.
    */
  private def fold(term: String) =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range($dsub), j -> " +
      s"$term)), (ac, t) -> ac + t)"
  private def foldSq(a: String, b: String)  = fold(s"($a[j+1] - $b[j+1]) * ($a[j+1] - $b[j+1])")
  private def foldDot(a: String, b: String) = fold(s"$a[j+1] * $b[j+1]")
  private def foldNorm2(a: String)          = fold(s"$a[j+1] * $a[j+1]")

  /** Shared fit-prefix CTEs (gs → … → cb1 → d): the per-subspace
    * k-means unroll plus the all-centroid L2² table, consumed by the
    * ADC top-k tail and the distortion tail — one fit contract, two
    * published views (the ann_ivf_kmeans pattern).
    */
  def fitCtesSql: String = fitCtesSqlWhere("TRUE")

  /** [[fitCtesSql]] with the FIT restricted to rows matching
    * `baseWhere` (init + assignment + centroid update), while `subn`
    * and the final distance table `d` still cover every vector — the
    * delta-absorption oracle shape: codebook fitted on the base corpus,
    * distances computed for base AND delta against it.
    */
  def fitCtesSqlWhere(baseWhere: String): String =
    s"""WITH gs AS (SELECT unnest(range($m)) AS s),
       |cb0 AS (
       |  SELECT gs.s, em.vec_id AS c,
       |    list_transform(range($dsub), j -> CAST(em.embedding[gs.s*$dsub + j + 1] AS DOUBLE)) AS e
       |  FROM embeddings em, gs WHERE em.vec_id < $kCent AND ($baseWhere)),
       |cn0 AS (SELECT s, c, e, sqrt(${foldNorm2("e")}) AS cnorm FROM cb0),
       |sub AS (
       |  SELECT em.vec_id, gs.s,
       |    list_transform(range($dsub), j -> CAST(em.embedding[gs.s*$dsub + j + 1] AS DOUBLE)) AS v
       |  FROM embeddings em, gs),
       |subn AS (SELECT vec_id, s, v, ${foldNorm2("v")} AS nv FROM sub),
       |subf AS (SELECT * FROM subn WHERE ($baseWhere)),
       |sc0 AS (
       |  SELECT sn.vec_id, sn.s, c0.c,
       |    CASE WHEN sn.nv = 0 THEN -2.0
       |         ELSE ${foldDot("sn.v", "c0.e")} / (sqrt(sn.nv) * c0.cnorm) END AS score
       |  FROM subf sn JOIN cn0 c0 ON c0.s = sn.s),
       |a0 AS (
       |  SELECT vec_id, s, c FROM (
       |    SELECT vec_id, s, c,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY score DESC, c ASC) AS rn
       |    FROM sc0) WHERE rn = 1),
       |ex AS (
       |  SELECT a0.s, a0.c, unnest(range($dsub)) AS pos,
       |    unnest(list_transform(sn.v, x -> CAST(trunc(x * 1000000) AS BIGINT))) AS xq
       |  FROM subf sn JOIN a0 ON a0.vec_id = sn.vec_id AND a0.s = sn.s),
       |upd AS (SELECT s, c, pos, SUM(xq) AS su, COUNT(*) AS n FROM ex GROUP BY s, c, pos),
       |cpos AS (SELECT s, c, unnest(range($dsub)) AS pos, unnest(e) AS cv FROM cb0),
       |cb1 AS (
       |  SELECT cp.s, cp.c,
       |    list(CASE WHEN u.su IS NULL THEN cp.cv
       |              ELSE CAST(u.su AS DOUBLE) / (1000000.0 * u.n) END ORDER BY cp.pos) AS e
       |  FROM cpos cp LEFT JOIN upd u ON u.s = cp.s AND u.c = cp.c AND u.pos = cp.pos
       |  GROUP BY cp.s, cp.c),
       |d AS (
       |  SELECT sn.vec_id, sn.s, c1.c, ${foldSq("sn.v", "c1.e")} AS dist
       |  FROM subn sn JOIN cb1 c1 ON c1.s = sn.s)""".stripMargin

  def oracleSql(queryIds: Seq[Long], k: Int = 10): String = {
    val ids = queryIds.sorted.mkString(", ")
    s"""$fitCtesSql,
       |codes AS (
       |  SELECT vec_id, s, c AS code FROM (
       |    SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
       |    FROM d) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, s, v AS qv FROM subn WHERE vec_id IN ($ids)),
       |lut AS (
       |  SELECT q.query_id, c1.s, c1.c,
       |    CAST(trunc(${foldDot("q.qv", "c1.e")} * 1000000) AS BIGINT) AS v
       |  FROM q JOIN cb1 c1 ON c1.s = q.s),
       |sc AS (
       |  SELECT l.query_id, cd.vec_id, CAST(sum(l.v) AS BIGINT) AS score_micro
       |  FROM codes cd JOIN lut l ON cd.s = l.s AND cd.code = l.c
       |  GROUP BY l.query_id, cd.vec_id),
       |rk AS (
       |  SELECT query_id, vec_id, score_micro,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, vec_id ASC) AS BIGINT) AS rnk
       |  FROM sc WHERE query_id <> vec_id)
       |SELECT query_id, vec_id, score_micro, rnk FROM rk WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** Distortion oracle: the fit prefix's `d` table reduced to each
    * (vector, subspace)'s nearest-centroid L2², µ-unit-truncated per
    * cell before aggregation (order-independent integer moments).
    */
  def distortionSql: String =
    s"""$fitCtesSql,
       |mind AS (SELECT vec_id, s, MIN(dist) AS dmin FROM d GROUP BY 1, 2),
       |q6 AS (
       |  SELECT vec_id, CAST(s AS BIGINT) AS s,
       |    CAST(trunc(dmin * 1000000) AS BIGINT) AS dist_u6
       |  FROM mind)
       |SELECT s, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  CAST(SUM(dist_u6) // COUNT(*) AS BIGINT) AS mean_dist_u6,
       |  CAST(MAX(dist_u6) AS BIGINT) AS max_dist_u6
       |FROM q6 GROUP BY 1 ORDER BY 1""".stripMargin
}
