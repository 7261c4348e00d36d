package graft.dedup

import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS local-fingerprinting scheme): hash every positional word
  * k-gram, slide a window of `w` gram hashes, and keep the MINIMUM hash
  * of each window. Guarantees every shared run of at least w+k-1 words
  * contributes at least one shared fingerprint (detection guarantee),
  * while selecting only ~1/w of all gram hashes (density guarantee) —
  * position-robust where whole-doc MinHash is not.
  *
  * The gram hash is its md5 hex string and window minima are
  * LEXICOGRAPHIC string minima: md5 parity is already proven
  * cross-engine (content fingerprints), hex strings order identically
  * in ASCII, and no integer-hash kernel needs mirroring in the oracle.
  *
  * Scale: fingerprint selection is pure map-side higher-order-function
  * work (one projection, no shuffle); the pair join runs on the
  * EXPLODED (doc, fp) frame with a document-frequency cap dropping
  * corpus-hot fingerprints (shared boilerplate) before the self-join —
  * the same viral-block guard as the MinHash/SetSim family.
  */
object Winnow {

  /** One row per (doc_id, distinct fingerprint).
    *
    * The gram-hash array is LET-BOUND (single-element-array transform,
    * same trick as `Vec.int8Normalize` / `Text.shingles`) before the
    * window lambda: higher-order functions evaluate interpreted, and an
    * unbound `slice(hs, i, w)` in the lambda body re-evaluates the whole
    * canon-regex + shingle + md5 chain for EVERY window index — measured
    * as a 20+-minute single task at sf0.1 before the binding.
    */
  def fingerprints(docs: DataFrame, k: Int = 4, w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 2, s"Winnow: need k >= 1, w >= 2, got k=$k w=$w")
    val hs = transform(Text.shingles(col("text"), k), g => md5(g))
    val fps = element_at(
      transform(array(hs), h => {
        val n = size(h)
        when(n === 0, array().cast("array<string>"))
          .when(n < w, array(array_min(h)))
          .otherwise(array_distinct(transform(
            sequence(lit(1), n - (w - 1)),
            i => array_min(slice(h, i, lit(w))))))
      }),
      1)
    docs.select(col("doc_id"), explode(fps).as("fp"))
  }

  /** Candidate near-dup pairs: docs sharing >= `minShared` fingerprints,
    * fingerprints appearing in more than `maxDf` docs dropped first.
    */
  def sharedPairs(
      docs: DataFrame,
      k: Int = 4,
      w: Int = 5,
      maxDf: Long = 50L,
      minShared: Long = 2L): DataFrame = {
    val fp = fingerprints(docs, k, w)
    val df = fp.groupBy("fp").agg(count(lit(1)).as("df"))
    val kept = fp.join(df.where(col("df") <= maxDf), "fp")
      .select(col("fp"), col("doc_id"))
    kept.as("a").join(kept.as("b"), Seq("fp"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }
}
