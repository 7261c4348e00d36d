package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an `array<float>` embedding column,
  * cosine-assignment flavor (spherical k-means), used to fit IVF index
  * centroids.
  *
  * Scale shape per iteration:
  *  - assignment is a MAP-SIDE expression: centroids are index metadata
  *    (O(k*d), collected once per iteration) broadcast as literals into a
  *    fused PlaneDots pass — the corpus never shuffles;
  *  - the update step shuffles only (cell, dim) partial sums with
  *    map-side combine: k*d rows total, independent of corpus size.
  * Initialization is deterministic (lowest `k` ids), so fits are
  * reproducible run-to-run — index builds must be.
  */
object KMeans {

  def fit(
      embeddings: DataFrame,
      k: Int,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = embeddings
      .where(col(idCol) < k)
      .orderBy(idCol)
      .select(vecCol)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(centroids.nonEmpty, s"need at least one of the $k lowest ids present")

    for (_ <- 0 until iters) {
      val cell = Cells.bestCell(col(vecCol), centroids.toSeq.map(_.toSeq))
      // partial sums as EXACT micro-unit integers: double summation order
      // across partition merges is nondeterministic, so summing doubles
      // would make centroids (and thus rebuilt indexes) drift in the low
      // bits between runs; integer sums + one final division are
      // bit-reproducible under any shuffle order.
      val partials = embeddings
        .select(cell.as("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(
          // truncating cast, not round(): equally deterministic, and
          // round() on doubles goes through BigDecimal per element
          sum(expr("CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      val counts = new Array[Long](centroids.length)
      partials.foreach { r =>
        val c = r.getAs[Number]("cell").intValue()
        counts(c) = r.getLong(3)
      }
      partials.foreach { r =>
        val c = r.getAs[Number]("cell").intValue()
        val p = r.getInt(1)
        if (counts(c) > 0) next(c)(p) = r.getLong(2).toDouble / (1e6 * counts(c))
      }
      centroids = next // empty cells keep their previous centroid
    }
    centroids
  }

  /** Fit SEVERAL cluster counts over the same corpus in one pass per
    * iteration (r14: `vec_kmeans_elbow` paid one init collect + one
    * assignment/update job PER k — 3 ks = 6 jobs + 3 corpus scans per
    * elbow evaluation). One collect of the max(ks) lowest ids seeds every
    * k's init (identical rows to the per-k collects); each iteration runs
    * ONE scan in which every k's cosine cell assignment (the same
    * [[Cells.bestCell]] expression) tags its vector and the
    * (k, cell, pos) integer-µ partial sums ride a single bounded
    * aggregate — per-k sums/counts, and therefore the returned centroids,
    * are bit-identical to sequential [[fit]] calls (R14OptSpec).
    */
  def fitMany(
      embeddings: DataFrame,
      ks: Seq[Int],
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Map[Int, Array[Array[Double]]] = {
    require(ks.nonEmpty, "need at least one k")
    val kMax = ks.max
    val initRows = embeddings
      .where(col(idCol) < kMax)
      .orderBy(idCol)
      .select(idCol, vecCol)
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getSeq[Float](1).map(_.toDouble).toArray))
    var cents: Map[Int, Array[Array[Double]]] = ks.map { k =>
      val init = initRows.filter(_._1 < k).map(_._2)
      require(init.nonEmpty, s"need at least one of the $k lowest ids present")
      k -> init
    }.toMap
    for (_ <- 0 until iters) {
      val tagged = ks.map { k =>
        struct(lit(k).as("k"),
          Cells.bestCell(col(vecCol), cents(k).toSeq.map(_.toSeq)).as("cell"))
      }
      val partials = embeddings
        .select(explode(array(tagged: _*)).as("t"), col(vecCol).as("v"))
        .select(col("t.k").as("k"), col("t.cell").as("cell"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("k", "cell", "pos")
        .agg(
          sum(expr("CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT)")).as("s"),
          count(lit(1)).as("n"))
        .collect() // bounded: sum(ks) x dims rows
      val next = cents.map { case (k, c) => k -> c.map(_.clone()) }
      partials.foreach { r =>
        val k = r.getInt(0)
        val c = r.getAs[Number](1).intValue()
        val p = r.getInt(2)
        val n = r.getLong(4)
        if (n > 0) next(k)(c)(p) = r.getLong(3).toDouble / (1e6 * n)
      }
      cents = next // empty cells keep their previous centroid
    }
    cents
  }

  /** Within-cluster cosine objective (sum of best-cell cosines — HIGHER
    * is better for spherical k-means). Used by specs to assert
    * iterations do not degrade the fit.
    */
  def objective(embeddings: DataFrame, centroids: Array[Array[Double]], vecCol: String = "embedding"): Double = {
    val scores = Cells.cellScores(col(vecCol), centroids.toSeq.map(_.toSeq))
    embeddings
      .select(array_max(scores).as("best"))
      .agg(sum("best"))
      .collect()(0)
      .getDouble(0)
  }
}

/** Persisted IVF index metadata: centroids as (cell, centroid) parquet.
  * At 100 TB the index is built once (k-means over a sample or the full
  * corpus) and reused by every probe job — exactly like the reference's
  * ANALYZE-once-then-query lifecycle, but for vector search.
  */
object IvfIndex {

  def build(
      embeddings: DataFrame,
      path: String,
      k: Int = 16,
      iters: Int = 3): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    val centroids = KMeans.fit(embeddings, k, iters)
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toSeq
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
    centroids
  }

  def load(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(path)
      .orderBy("cell")
      .collect()
      .map(_.getSeq[Double](1).toArray)
}
