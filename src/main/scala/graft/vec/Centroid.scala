package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Nearest-class-centroid classification over labeled embeddings — the
  * supervised counterpart of the IVF KMeans: fit one centroid per label,
  * assign every vector to its nearest centroid, and report the confusion
  * matrix (how separable the label space is under the embedding — the
  * diagnostic run before trusting embedding-based routing or weak
  * labels).
  *
  * Exactness: vectors are int8-normalized ([[Vec.int8Normalize]]);
  * centroids are per-label integer sums trunc-divided at fixed-point
  * scale `k` (sign·(|S|·k quot N), mirrored by the oracle); distances
  * are exact integer L2² between k-scaled vectors and centroids, argmin
  * ties break to the lowest label. Every step is integer arithmetic —
  * bit-identical cross-engine.
  *
  * Scale: the fit is ONE groupBy(label) with d map-side-combined sums
  * (reduce state = labels × d); only the labels × d centroid table is
  * collected (bounded index metadata). Prediction is map-side — the
  * centroids ride into codegen as literals, distances and argmin are
  * per-row expressions — and the confusion matrix is one tiny
  * groupBy(label, pred). The corpus never shuffles.
  */
object Centroid {

  /** Pairwise centroid cosine affinity between label groups — the
    * domain-similarity matrix behind data-mixture design: when two
    * sources/labels sit on near-parallel centroids, their budgets
    * compete for the same capacity; orthogonal ones complement. Fit is
    * the same one-groupBy(label) d-sum pass as [[classify]]; the
    * pairwise fold runs on the collected labels×d centroid table
    * (bounded index metadata, the Markov/KMeans driver contract) in
    * exact integer dot products, one IEEE floor-division per pair to
    * µ-precision. Output is the labels²/2 upper triangle.
    */
  def affinity(embeddings: DataFrame, k: Long = 1024L): DataFrame = {
    val s = embeddings.sparkSession
    val d = embeddings.select(size(col("embedding"))).head().getInt(0)
    val q8 = embeddings.select(
      col("label").cast("long").as("label"),
      Vec.int8Normalize(col("embedding")).as("q"))
    val fitRows = q8.groupBy("label").agg(
      count(lit(1)).as("n"),
      (0 until d).map(j => sum(element_at(col("q"), j + 1)).as(s"s$j")): _*)
      .collect() // bounded: one row per label
    val cents: Seq[(Long, Long, Array[Long])] = fitRows.map { r =>
      val n = r.getAs[Long]("n")
      val c = Array.tabulate(d)(j => r.getLong(2 + j) * k / n)
      (r.getAs[Long]("label"), n, c)
    }.toSeq.sortBy(_._1)
    val rows = for {
      (la, na, ca) <- cents
      (lb, nb, cb) <- cents if la < lb
    } yield {
      val dot = (0 until d).map(j => ca(j) * cb(j)).sum
      val naa = (0 until d).map(j => ca(j) * ca(j)).sum
      val nbb = (0 until d).map(j => cb(j) * cb(j)).sum
      val cos = if (naa == 0L || nbb == 0L) 0L
        else math.floor(dot.toDouble * 1e6 / math.sqrt(naa.toDouble * nbb.toDouble)).toLong
      (la, lb, na, nb, cos)
    }
    import s.implicits._
    rows.toDF("label_a", "label_b", "n_a", "n_b", "cos_x1e6")
  }

  def classify(embeddings: DataFrame, k: Long = 1024L): DataFrame = {
    require(k >= 2L && k <= (1L << 20), s"classify: scale k out of range: $k")
    val d = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(d >= 1, "classify: empty embedding vector")

    val q8 = embeddings.select(
      col("vec_id"),
      col("label").cast("long").as("label"),
      Vec.int8Normalize(col("embedding")).as("q"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val fitRows = q8.groupBy("label").agg(
        count(lit(1)).as("n"),
        (0 until d).map(j => sum(element_at(col("q"), j + 1)).as(s"s$j")): _*)
        .collect() // bounded: one row per label
      require(fitRows.nonEmpty, "classify: no labeled rows")
      val cents: Seq[(Long, Array[Long])] = fitRows.map { r =>
        val n = r.getAs[Long]("n")
        val c = Array.tabulate(d) { j =>
          val s = r.getLong(2 + j)
          s * k / n // Long division: trunc toward zero, sign-correct
        }
        r.getAs[Long]("label") -> c
      }.toSeq.sortBy(_._1)

      def dist(c: Array[Long]): Column =
        aggregate(
          zip_with(col("q"), typedLit(c.toSeq),
            (x, cc) => (x * lit(k) - cc) * (x * lit(k) - cc)),
          lit(0L), (a, b) => a + b)

      val withDists = q8.select(
        col("vec_id") +: col("label") +:
          cents.map { case (l, c) => dist(c).as(s"d$l") }: _*)
      val m = least(cents.map { case (l, _) => col(s"d$l") }: _*)
      // ascending-label scan: first label hitting the min wins ties
      val pred = cents.reverse.foldLeft(lit(-1L)) { case (els, (l, _)) =>
        when(col(s"d$l") === m, lit(l)).otherwise(els)
      }
      // materialize the tiny confusion matrix while q8 is cached, then
      // release the intermediate (caller owns the persisted result)
      val conf = withDists
        .select(col("label"), pred.as("pred"))
        .groupBy("label", "pred").agg(count(lit(1)).as("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      conf.count()
      conf
    } finally { q8.unpersist(blocking = false); () }
  }
}
