package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale shape: one map-side explode (no shuffle), one shuffle on the
  * segment text for the first-occurrence window, one shuffle on doc_id
  * for reassembly. Nothing pairwise, nothing on the driver. The window
  * partitions by full segment text rather than a 64-bit hash so a hash
  * collision can never silently delete a unique segment; the shuffled
  * bytes are the same either way (the segment rides along regardless
  * for reassembly).
  */
object LineDedup {

  def dedupSegments(
      docs: DataFrame,
      windowWords: Int = 40,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val chunks = Chunking.chunkByWords(docs, windowWords, textCol, Seq(idCol))
    val firstOcc = Window.partitionBy(col("chunk_text"))
      .orderBy(col(idCol), col("chunk_idx"))
    chunks
      .withColumn("__rn", row_number().over(firstOcc))
      .where(col("__rn") === 1)
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
