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

  /** One learned merge of the batched fit: global `step` (1-based across
    * stages), the stage it was learned in, its rank within the stage's
    * kept set, the merged pair, and the pair's occurrence-weighted count
    * at selection time (BEFORE the stage's earlier merges applied).
    */
  final case class Merge(step: Int, stage: Int, krn: Int, a: String, b: String, weight: Long)

  /** SentencePiece-style pretokenization UNITS for the real-vocab fit:
    * the canonical word stream chunks into NON-overlapping adjacent word
    * pairs joined by the boundary marker '_' (odd tail = single word).
    * Space is a symbol, so merges can learn multi-word tokens — on a
    * template-vocabulary corpus (31 distinct words here) word-level BPE
    * saturates at ~Σ(len−1) ≈ 124 merges, while the unit dictionary is
    * bounded by vocab² and supports realistic (≥256) merge tables. '_'
    * cannot collide with content: canonical text is [a-z0-9 ] only.
    */
  def units(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unitsOfWords(Text.words(text))

  /** Unit chunking over an ALREADY-MATERIALIZED words array column.
    * Callers that explode units over a corpus should project the words
    * array first and chunk the projected column — referencing
    * `units(text)` directly re-evaluates the full canon+split chain for
    * every element_at inside the lambda (measured ~5× per unit,
    * ~10 s/pass at sf0.1 vs ~1 s with the projection).
    */
  def unitsOfWords(ws: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(ws) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), ((size(ws) + lit(1)) / lit(2)).cast("int")),
        i => when(i * 2 <= size(ws),
          concat(element_at(ws, i * 2 - 1), lit("_"), element_at(ws, i * 2)))
          .otherwise(element_at(ws, i * 2 - 1))))

  /** Delimiter encoding of a unit's initial character symbols:
    * "ab_c" -> "|a||b||_||c|" (the same tokstr convention as
    * [[fitMerges]]; tokens are [a-z0-9_]+ so '|' never occurs inside
    * one).
    */
  def charTokstr(unit: String): String =
    unit.iterator.map(c => s"|$c|").mkString

  private[text] def toks(tokstr: String): Array[String] = {
    val t = tokstr.substring(1, tokstr.length - 1)
    // split on the literal "||" separator; a 1-token string has none
    t.split("\\|\\|", -1)
  }

  /** BATCHED greedy BPE training on a driver-local dictionary — the
    * production-trainer shape (one pair per iteration needs corpus-count
    * refreshes per merge; real fits take the top-k SYMBOL-DISJOINT pairs
    * per stage so one counting pass buys k merges). Contract, mirrored
    * bit-for-bit by the generated DuckDB oracle chain and by the Spark
    * keys:
    *  - `dict` is (unit, freq), ALREADY capped/ordered upstream.
    *  - each stage counts every adjacent token position (occurrence-
    *    weighted), ranks pairs by (count desc, a, b),
    *  - keeps the top-`topN` ranked pairs that share NO symbol with any
    *    higher-ranked pair of the same top-`topN` window (whether or not
    *    that pair was itself kept — the non-recursive rule both engines
    *    can evaluate without a sequential scan),
    *  - applies the kept merges in rank order as plain non-overlapping
    *    left-to-right string replaces of "|a||b|" -> "|ab|".
    * Driver state is the dictionary (vocab²-bounded by the unit
    * construction; production fits cap it top-K — the same bounded-
    * driver-state contract as the k-means centroids).
    *
    * Returns (merges, final dictionary as (unit, tokstr, freq)).
    */
  def fitMergesBatched(
      dict: Seq[(String, Long)],
      stages: Int,
      topN: Int): (Seq[Merge], Seq[(String, String, Long)]) = {
    var cur: Array[(String, String, Long)] =
      dict.map { case (w, n) => (w, charTokstr(w), n) }.toArray
    val merges = scala.collection.mutable.ListBuffer[Merge]()
    var step = 0
    var dry = false
    for (stage <- 1 to stages if !dry) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      cur.foreach { case (_, ts, n) =>
        val tk = toks(ts)
        var j = 0
        while (j < tk.length - 1) {
          val k = (tk(j), tk(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          j += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        val top = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }
          .take(topN)
        val kept = top.zipWithIndex.collect {
          case (((a, b), c), rn)
              if !top.take(rn).exists { case ((qa, qb), _) =>
                qa == a || qa == b || qb == a || qb == b } =>
            (a, b, c)
        }
        kept.zipWithIndex.foreach { case ((a, b, c), i) =>
          step += 1
          merges += Merge(step, stage, i + 1, a, b, c)
        }
        kept.foreach { case (a, b, _) =>
          cur = cur.map { case (w, ts, n) => (w, ts.replace(s"|$a||$b|", s"|$a$b|"), n) }
        }
      }
    }
    (merges.toList, cur.toSeq)
  }

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
