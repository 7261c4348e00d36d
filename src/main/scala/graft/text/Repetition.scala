package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style n-gram REPETITION signals (Rae et al. 2021, appendix A1.1
  * "repetitious text" filters) — the document-internal repetition family
  * that `Gopher.metrics` (word-level dup/top-word fractions) does not
  * cover:
  *
  *   - `top_bigram_frac`: characters attributable to the single most
  *     repeated word 2-gram (count × gram length) as a fraction of the
  *     canonical text length. Boilerplate headers/footers and keyword
  *     stuffing concentrate mass in one bigram.
  *   - `dup5_frac`: fraction of word 5-gram OCCURRENCES whose gram
  *     appears at least twice in the document. Catches long duplicated
  *     spans (templated paragraphs, lyrics-style loops) that no
  *     single-word statistic sees.
  *
  * Scale design: ONE explode of the corpus (both gram sizes tagged into
  * a single occurrence stream) → one (doc_id, k, gram) map-side-combined
  * groupBy — the key is prefixed by doc_id so the shuffle is perfectly
  * spread regardless of corpus-wide gram skew (a boilerplate gram shared
  * by 10M docs never concentrates: each doc owns its own counting keys).
  * The per-doc reduction then runs on the tiny (doc, gram)-count frame.
  * Both ratios are a SINGLE division of two exact bigints, so DuckDB
  * reproduces the doubles bit-for-bit.
  *
  * Reference scope note: quality gates live outside the reference's
  * loader surface (pandas_to_postgres copies verbatim); this is part of
  * the LLM-training-data layer built on the same engine.
  */
object Repetition {

  /** Word k-grams as an occurrence LIST (multiset semantics — unlike the
    * dedup paths, repeats must be kept). Shorter-than-k docs yield one
    * gram = the whole text; empty canon yields none.
    */
  private def gramOccurrences(w: Column, k: Int): Column =
    Text.shinglesOfWords(w, k)

  def metrics(
      docs: DataFrame,
      maxTopBigramFrac: Double = 0.2,
      maxDup5Frac: Double = 0.3): DataFrame = {
    // Bind the words array once per row (let-binding via Text.words),
    // then derive both gram streams from it map-side.
    val base = docs.select(
      col("doc_id"),
      Text.words(col("text")).as("w"),
      length(Text.canon(col("text"))).cast("long").as("n_chars_canon"))

    val tagged = base.select(
      col("doc_id"),
      explode(
        concat(
          transform(gramOccurrences(col("w"), 2),
            g => struct(lit(2).as("k"), g.as("g"))),
          transform(gramOccurrences(col("w"), 5),
            g => struct(lit(5).as("k"), g.as("g"))))).as("kg"))
      .select(col("doc_id"), col("kg.k").as("k"), col("kg.g").as("g"))

    val perGram = tagged
      .groupBy("doc_id", "k", "g")
      .agg(count(lit(1)).as("c"))

    val perDoc = perGram
      .groupBy("doc_id")
      .agg(
        max(when(col("k") === 2, col("c") * length(col("g"))))
          .as("top2_chars"),
        sum(when(col("k") === 5 && col("c") >= 2, col("c")))
          .as("dup5_occ"),
        sum(when(col("k") === 5, col("c"))).as("tot5_occ"))

    base
      .select("doc_id", "n_chars_canon")
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        col("n_chars_canon"),
        coalesce(col("top2_chars"), lit(0L)).as("top2_chars"),
        coalesce(col("dup5_occ"), lit(0L)).as("dup5_occ"),
        coalesce(col("tot5_occ"), lit(0L)).as("tot5_occ"))
      .withColumn(
        "top_bigram_frac",
        when(col("n_chars_canon") === 0, lit(0.0))
          .otherwise(col("top2_chars").cast("double") / col("n_chars_canon")))
      .withColumn(
        "dup5_frac",
        when(col("tot5_occ") === 0, lit(0.0))
          .otherwise(col("dup5_occ").cast("double") / col("tot5_occ")))
      .withColumn(
        "keep",
        col("top_bigram_frac") < maxTopBigramFrac &&
          col("dup5_frac") < maxDup5Frac)
  }
}
