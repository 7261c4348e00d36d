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

  /** ExactSubstr REMOVAL (Lee et al. 2022 §4.1): where [[duplicated]]
    * only measures cross-document repeated spans, this CUTS them and
    * reassembles each document from the surviving words. A word
    * position is removed when ANY duplicated `n`-gram (one occurring in
    * ≥2 documents) covers it; the removed mass per document is exactly
    * the union length of the detected span intervals, so
    * `n_removed = |∪ [i, i+n-1]|` over the detected starts — the
    * detected-mass = removed-mass invariant the oracle pins.
    *
    * Scale shape: the detection side is [[duplicated]]'s linear
    * explode/reduce (counts keyed (doc_id, gram), spread reduced to
    * the duplicated grams before the join back); the removal side
    * brings each doc's dup-start list home with one bounded
    * collect_list (≤ n_words entries per doc — document-bounded, the
    * same bound as the text itself) and filters words map-side. The
    * per-word coverage probe is O(starts) worst-case (fully-duplicated
    * doc), i.e. O(words²) per pathological document — bounded by
    * document length, never corpus-shaped; production pipelines chunk
    * documents long before this matters.
    */
  def removeDuplicated(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 2, s"Spans.removeDuplicated: need n >= 2, got $n")
    val d = docs.select(col("doc_id"), Text.words(col("text")).as("w"))
    // positional grams (1-based start i), only for docs with >= n words
    // (shorter docs have no position that can be cross-doc duplicated)
    val pos = d.where(size(col("w")) >= n)
      .select(col("doc_id"),
        posexplode(Text.shinglesOfWords(col("w"), n)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"), col("col").as("g"))
    // grams occurring in >= 2 docs — reduce to (doc,gram) before the
    // spread count so corpus-hot boilerplate grams stay combinable
    val dupG = pos.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("g").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= 2L).select("g")
    val starts = pos.join(dupG, "g")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("i"))).as("starts"))
    d.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("w"),
        coalesce(col("starts"), array().cast("array<long>")).as("starts"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        size(col("starts")).cast("long").as("n_dup_starts"),
        filter(col("w"), (_, j0) =>
          !exists(col("starts"), s => s <= j0 + 1 && j0 + 1 <= s + (n - 1))).as("kept"))
      .select(
        col("doc_id"), col("n_words"), col("n_dup_starts"),
        (col("n_words") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("kept_text"))
  }
}
