package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition / quality heuristics in the style of the published Gopher
  * and C4 filtering rules: duplicate-word fraction, most-frequent-word
  * fraction, mean word length, symbol ratio, and a composite keep flag.
  *
  * Scale shape: the per-doc metrics are map-side expressions; the
  * most-frequent-word count is the one genuinely relational piece —
  * explode(words) → per-(doc, word) partial counts → per-doc max, i.e.
  * one shuffle keyed by (doc_id, word) with map-side combine, then a
  * broadcast-free re-join on doc_id. No pairwise work anywhere.
  *
  * Determinism: every ratio is a SINGLE division of two exact bigints,
  * so DuckDB reproduces each double bit-for-bit.
  */
object Gopher {

  def metrics(
      docs: DataFrame,
      minWords: Long = 5,
      maxWords: Long = 1000,
      maxDupFrac: Double = 0.6,
      maxTopWordFrac: Double = 0.2,
      maxSymbolRatio: Double = 0.3): DataFrame = {
    val wc = Text.wordCount(col("text"))
    val distinctWords =
      when(size(Text.words(col("text"))) === 0, lit(0L))
        .otherwise(size(array_distinct(Text.words(col("text")))).cast("long"))
    val base = docs.select(
      col("doc_id"),
      wc.as("n_words"),
      distinctWords.as("n_distinct"),
      // letters-only length of the canonical text (spaces removed)
      length(replace(Text.canon(col("text")), lit(" "), lit(""))).cast("long").as("n_word_chars"),
      Text.punctCount(col("text")).as("n_symbols"),
      length(col("text")).cast("long").as("n_chars"))
    // most-frequent-word count: explode -> (doc, word) counts -> per-doc max
    val topWord = docs
      .select(col("doc_id"), explode(Text.words(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_word_n"))
    base
      .join(topWord, Seq("doc_id"), "left_outer")
      .withColumn("top_word_n", coalesce(col("top_word_n"), lit(0L)))
      .withColumn(
        "dup_frac",
        when(col("n_words") === 0, lit(0.0))
          .otherwise((col("n_words") - col("n_distinct")).cast("double") / col("n_words")))
      .withColumn(
        "top_word_frac",
        when(col("n_words") === 0, lit(0.0))
          .otherwise(col("top_word_n").cast("double") / col("n_words")))
      .withColumn(
        "mean_word_len",
        when(col("n_words") === 0, lit(0.0))
          .otherwise(col("n_word_chars").cast("double") / col("n_words")))
      .withColumn(
        "symbol_ratio",
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(col("n_symbols").cast("double") / col("n_chars")))
      .withColumn(
        "keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("dup_frac") < maxDupFrac &&
          col("top_word_frac") < maxTopWordFrac &&
          col("symbol_ratio") < maxSymbolRatio)
      .select(
        "doc_id", "n_words", "n_distinct", "top_word_n", "dup_frac",
        "top_word_frac", "mean_word_len", "symbol_ratio", "keep")
  }
}
