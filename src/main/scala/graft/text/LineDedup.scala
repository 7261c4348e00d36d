package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide duplicate-segment removal — the C4/RefinedWeb "line
  * dedup" step, generalized to fixed word windows so it also applies to
  * corpora without newline structure (ref: pandas-to-postgres has no
  * text ops; this is part of the training-data surface beyond it).
  *
  * Every document is split into `windowWords`-word segments
  * ([[Chunking.chunkByWords]]); a segment that occurs in more than one
  * place corpus-wide is kept ONLY at its first occurrence (smallest
  * (doc_id, chunk_idx)); each document is then reassembled from its
  * surviving segments. Documents left with no segments drop out (C4
  * drops emptied lines/docs the same way).
  *
  * Scale shape: one map-side explode (no shuffle), one groupBy on the
  * segment text for the first-occurrence winner, one shuffle on doc_id
  * for reassembly. Nothing pairwise, nothing on the driver.
  *
  * Skew safety: first-occurrence selection is a `min(struct(doc_id,
  * chunk_idx))` aggregation, NOT a row_number window. A window
  * partitioned by segment text must co-locate every occurrence of a
  * segment in one task — and viral boilerplate (headers, license
  * blocks: exactly what segment dedup exists to remove) makes that a
  * hot key at 100 TB. min-struct is partially aggregatable, so each map
  * task collapses its local copies of a hot segment to ONE partial row
  * before the shuffle: per-reducer work is bounded by distinct segments,
  * not occurrences, and shuffled bytes shrink by the local duplication
  * factor. Keying by the full segment text (not a 64-bit hash) costs
  * nothing extra — the winning text must cross the shuffle anyway for
  * reassembly — and makes hash-collision segment loss impossible.
  */
object LineDedup {

  /** WITHIN-document segment dedup: each document independently drops
    * repeats of its own `windowWords`-word segments (the "repeated
    * paragraph" cleanup that precedes corpus-wide dedup in C4-style
    * pipelines). Entirely MAP-SIDE — no shuffle, no state: the whole
    * operator is one higher-order-function expression per row, so it
    * scales linearly with the corpus and composes for free with any
    * downstream stage. Documents with no canonical words drop out.
    *
    * The chunks array is let-bound via the single-element-array
    * transform so the keep-filter's `array_contains(slice(...))` probe
    * does not recompute the chunking per element.
    */
  def dedupWithinDoc(
      docs: DataFrame,
      windowWords: Int = 40,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val w = graft.text.Text.words(col(textCol))
    val kept = element_at(
      transform(array(w), wb => {
        val nch = ceil(size(wb).cast("double") / windowWords).cast("int")
        val chunks = transform(
          sequence(lit(0), greatest(nch - 1, lit(0))),
          i => array_join(slice(wb, i * windowWords + 1, lit(windowWords)), " "))
        when(size(wb) === 0, array().cast("array<string>"))
          .otherwise(element_at(
            transform(array(chunks), ch =>
              filter(ch, (c, i) => !array_contains(slice(ch, lit(1), i), c))),
            1))
      }),
      1)
    docs
      .select(col(idCol), kept.as("k"))
      .where(size(col("k")) > 0)
      .select(
        col(idCol),
        array_join(col("k"), " ").as("kept_text"),
        size(col("k")).cast("long").as("n_kept"))
  }

  def dedupSegments(
      docs: DataFrame,
      windowWords: Int = 40,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val chunks = Chunking.chunkByWords(docs, windowWords, textCol, Seq(idCol))
    chunks
      .groupBy(col("chunk_text"))
      .agg(min(struct(col(idCol), col("chunk_idx"))).as("w"))
      .select(col(s"w.$idCol").as(idCol), col("w.chunk_idx").as("chunk_idx"), col("chunk_text"))
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
            c => c("chunk_text")),
          " ").as("kept_text"),
        count(lit(1)).as("n_kept"))
  }
}
