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

  /** SQL expr for the token list of a delimiter-encoded `tokstr`
    * ('|a||bc|…' → ['a','bc',…]); tokens are [a-z0-9]+ so '|' can
    * never occur inside one.
    */
  val toksExpr: String = "split(trim(BOTH '|' FROM tokstr), '\\\\|\\\\|')"

  /** The full BPE TRAINING loop (Sennrich et al. 2016): `steps` greedy
    * merge iterations over the word-TYPE dictionary (vocab-bounded,
    * never the token stream). Each iteration finds the highest-weight
    * adjacent token pair (tie-break: weight desc, a, b) and rewrites
    * every word's token sequence greedy-left-to-right via a plain
    * non-overlapping string replace on the delimiter encoding.
    *
    * Returns (merges as (step, a, b, weight), post-merge dictionary
    * `(w, tokstr, n)`). The dictionary comes back PERSISTED —
    * caller-owned, unpersist (or clearCache) when done. Driver state
    * per iteration is the 1-row top pair (the bounded
    * iterative-convergence contract shared with KMeans/PageRank).
    */
  def fitMerges(docs: DataFrame, steps: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    val words = docs
      .select(explode(Text.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("w"), expr("regexp_replace(w, '(.)', '|$1|')").as("tokstr"), col("n"))
    var cur = words.persist()
    cur.count()
    val merges = scala.collection.mutable.ListBuffer[(Int, String, String, Long)]()
    var dry = false
    for (step <- 1 to steps if !dry) {
      val top = cur
        .select(col("n"), expr(
          s"explode(transform(slice($toksExpr, 1, size($toksExpr) - 1), " +
            s"(t, i) -> struct(t as a, ($toksExpr)[i + 1] as b)))").as("p"))
        .groupBy("p.a", "p.b").agg(sum("n").as("c"))
        .orderBy(desc("c"), col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) {
        // every word is a single token already: no pair left to merge.
        // Never happens on a natural corpus before tens of thousands of
        // merges; guarded so tiny spec corpora can't crash the fit.
        dry = true
      } else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, a, b, c))
        val next = cur.withColumn("tokstr",
          expr(s"replace(tokstr, '|$a||$b|', '|$a$b|')")).persist()
        next.count(); cur.unpersist(); cur = next
      }
    }
    (merges.toList, cur)
  }
}
