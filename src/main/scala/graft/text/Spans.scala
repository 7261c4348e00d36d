package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicated-substring span analysis — the document-level signal behind
  * exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): a position in a document is
  * "duplicated" when the word n-gram starting there also occurs in at
  * least one OTHER document. The per-doc duplicated fraction localizes
  * cross-document boilerplate that whole-doc near-dedup misses (a unique
  * article wrapped in a shared template scores high here and low on
  * MinHash).
  *
  * A full distributed suffix array is the exact-match limit of this
  * construction; fixed-width n-grams keep the same contract
  * SQL-expressible (the oracle replays the explode) and the cost
  * linear: one explode of ~n_words rows per doc, counts keyed
  * (doc_id, gram) so corpus-hot boilerplate grams never concentrate a
  * partition, and the cross-doc table reduced to (gram, n_docs) before
  * the join back.
  */
object Spans {

  /** Per-doc duplicated-span stats over word `n`-grams:
    * `n_grams` positions, `dup_grams` positions whose gram occurs in ≥2
    * docs, `dup_frac` their ratio (one exact-int division), and
    * `keep` = dup_frac <= `maxDupFrac`.
    */
  def duplicated(docs: DataFrame, n: Int, maxDupFrac: Double): DataFrame = {
    require(n >= 2, s"Spans.duplicated: need n >= 2, got $n")
    // Text.shingles let-binds the words array before the gram lambda —
    // an unbound slice(words, i, n) in the lambda body would re-run the
    // canon regex per gram position (interpreted HOF path). Docs shorter
    // than n words yield one whole-text gram that can never be
    // position-duplicated, matching the < n => no-grams contract only
    // when filtered; keep the short-doc guard explicit.
    val w = Text.words(col("text"))
    val grams = when(size(w) < n, array().cast("array<string>"))
      .otherwise(Text.shingles(col("text"), n))
    // positional counts: c occurrences of gram g in this doc
    val cnt = docs
      .select(col("doc_id"), explode(grams).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    // cross-doc spread, computed from the already-reduced frame
    val spread = cnt.groupBy("g").agg(count(lit(1)).as("n_docs"))
    val per = cnt.join(spread, "g")
      .groupBy("doc_id")
      .agg(
        sum("c").as("ng"),
        sum(when(col("n_docs") >= 2L, col("c")).otherwise(0L)).as("dg"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("ng"), lit(0L)).as("n_grams"),
        coalesce(col("dg"), lit(0L)).as("dup_grams"))
      .withColumn("dup_frac",
        when(col("n_grams") === 0L, lit(0.0))
          .otherwise(col("dup_grams").cast("double") / col("n_grams").cast("double")))
      .withColumn("keep", col("dup_frac") <= lit(maxDupFrac))
  }
}
