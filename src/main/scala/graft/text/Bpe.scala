package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-fit building block: corpus-wide adjacent-symbol-pair counts
  * — the merge-candidate table BPE training scores on each iteration
  * (Sennrich et al. 2016; the first iteration's symbols are characters).
  *
  * Scale shape: the pair explosion runs over the word DICTIONARY
  * (distinct word, corpus frequency) rather than the token stream, so
  * its cost is |vocab| × word-length and the corpus is touched exactly
  * once (the dictionary groupBy — the same map-side-combined shuffle a
  * token count pays). This is the classic BPE-training trick: natural
  * text repeats words massively, so fitting on (word, freq) is orders
  * of magnitude cheaper than on occurrences.
  */
object Bpe {

  /** (pair, n) counts: for every adjacent character pair inside each
    * canonical word, n = Σ corpus frequency of the containing words
    * (occurrence-weighted, as BPE scores merges). Single-char words
    * contribute nothing.
    */
  def pairCounts(docs: DataFrame): DataFrame = {
    val dict = docs
      .select(explode(Text.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    dict
      .where(length(col("w")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))
  }
}
