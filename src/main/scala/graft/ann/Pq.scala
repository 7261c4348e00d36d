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
  * The codebook here is the deterministic sampled variant (sub-vectors
  * of the k lowest vec_ids — same precedent as ann_ivf_topk's fallback
  * centroids); production swaps in a per-subspace KMeans.fit without
  * touching encode/score.
  */
object Pq {

  val m = 8      // subspaces
  val dsub = 8   // dims per subspace (m * dsub = embedding dim)
  val kCent = 16 // centroids per subspace

  /** codebook(s)(c): dsub doubles — sub-vector c of subspace s. */
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
  def codes(v: Column, cb: Array[Array[Array[Double]]]): Column = {
    val perS = (0 until m).map { s =>
      val sub = slice(v, s * dsub + 1, dsub)
      val dists = array((0 until kCent).map { c =>
        aggregate(
          zip_with(sub, typedLit(cb(s)(c).toSeq),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, x) => a + x)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    array(perS: _*)
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
    val cb = sampledCodebook(embeddings)
    val qRows = embeddings.where(col("vec_id").isInCollection(queryIds))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val coded = embeddings.select(col("vec_id"), codes(col("embedding"), cb).as("codes"))
    val scoreStructs = qRows.map { case (qid, q) =>
      val lutLit = typedLit(lut(q, cb).toSeq)
      val sc = aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
          (code, s) => element_at(lutLit, (s * kCent + code + 1).cast("int"))),
        lit(0L), (a, x) => a + x)
      struct(lit(qid).as("query_id"), sc.as("score_micro"))
    }
    val scored = coded
      .select(col("vec_id"), explode(array(scoreStructs.toIndexedSeq: _*)).as("qs"))
      .select(col("qs.query_id").as("query_id"), col("vec_id"), col("qs.score_micro").as("score_micro"))
      .where(col("query_id") =!= col("vec_id"))
    val top = graft.plans.TopK.perKey(
      scored, Seq("query_id"), Seq("score_micro" -> true, "vec_id" -> false), k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score_micro").desc, col("vec_id").asc)
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("query_id"), col("vec_id"), col("score_micro"), col("rnk"))
  }

  /** DuckDB oracle for [[adcTopK]] (codes, luts, scores bit-exact). */
  def oracleSql(queryIds: Seq[Long], k: Int = 10): String = {
    val ids = queryIds.sorted.mkString(", ")
    def foldSq(a: String, b: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range($dsub), j -> " +
        s"(CAST($a AS DOUBLE) - CAST($b AS DOUBLE)) * (CAST($a AS DOUBLE) - CAST($b AS DOUBLE)))), (ac, t) -> ac + t)"
    def foldDot(a: String, b: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range($dsub), j -> " +
        s"CAST($a AS DOUBLE) * CAST($b AS DOUBLE))), (ac, t) -> ac + t)"
    val ve = s"v.embedding[gs.s*$dsub + j + 1]"
    val qe = s"q.qe[gs.s*$dsub + j + 1]"
    val ce = s"c.e[gs.s*$dsub + j + 1]"
    s"""WITH cb AS (SELECT vec_id AS c, embedding AS e FROM embeddings WHERE vec_id < $kCent),
       |gs AS (SELECT unnest(range($m)) AS s),
       |d AS (
       |  SELECT v.vec_id, gs.s, c.c, ${foldSq(ve, ce)} AS dist
       |  FROM embeddings v, gs, cb c),
       |codes AS (
       |  SELECT vec_id, s, c AS code FROM (
       |    SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
       |    FROM d) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN ($ids)),
       |lut AS (
       |  SELECT q.query_id, gs.s, c.c,
       |    CAST(trunc(${foldDot(qe, ce)} * 1000000) AS BIGINT) AS v
       |  FROM q, gs, cb c),
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
}
