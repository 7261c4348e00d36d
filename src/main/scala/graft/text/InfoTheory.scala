package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Information-theoretic quality signals for the training-data pipeline:
  * per-document word entropy and corpus-fit unigram surprisal (the
  * classic perplexity filter — CCNet/Wenzek et al. use a 5-gram LM; the
  * unigram variant keeps the same keep-the-middle contract while staying
  * SQL-expressible for the oracle).
  *
  * Cross-engine exactness: both signals are sums of QUANTIZED logs held
  * as BIGINTs — qln(x) = floor(ln(x)·1e9) — so every aggregate is exact
  * integer arithmetic (order-free, no float-fold mirroring needed) and
  * each document's score is ONE final division of two exact integers.
  * ln is not correctly-rounded identically across engines, but both
  * floor at 1e-9, so they land on the same integer unless the true value
  * sits within ~1e-7 of a floor boundary — which the hash gate itself
  * would catch for the fixed test data (same argument as the BM25 idf).
  *
  * Scale: both are ONE explode + (doc_id, word)-keyed counts — doc_id
  * prefixes the key so corpus-wide hot words (stopwords) never
  * concentrate a partition. Surprisal's dictionary join runs on the
  * ALREADY per-doc-reduced (doc_id, word, count) frame, so a hot word
  * contributes one row per document containing it, not one per
  * occurrence; the dictionary itself is never collected (only the 1-row
  * corpus total is).
  */
object InfoTheory {

  /** floor(ln(x)·1e9) as BIGINT — exact-summable log units. */
  private def qln(x: Column): Column =
    floor(log(x.cast("double")) * lit(1e9)).cast("long")

  /** Per-document Shannon word entropy (nats).
    *
    * H = ln(n) − (1/n)·Σ c_t·ln(c_t) over word counts c_t, carried as
    * ent_q = n·qln(n) − Σ c_t·qln(c_t) (BIGINT, exact). Low entropy =
    * repetitive/templated text; the keep gate drops docs below
    * `keepMinNats`. Wordless docs score 0 and fail the gate.
    */
  def entropy(docs: DataFrame, keepMinNats: Double): DataFrame = {
    val cnt = docs
      .select(col("doc_id"), explode(Text.words(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val per = cnt.groupBy("doc_id").agg(
      sum("c").as("nw"),
      count(lit(1)).as("nd"),
      sum(col("c") * qln(col("c"))).as("sc"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("nw"), lit(0L)).as("n_words"),
        coalesce(col("nd"), lit(0L)).as("n_distinct"),
        coalesce(col("sc"), lit(0L)).as("sc"))
      .withColumn("ent_q",
        when(col("n_words") === 0L, lit(0L))
          .otherwise(col("n_words") * qln(col("n_words")) - col("sc")))
      .withColumn("entropy_nats",
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("ent_q").cast("double") /
            (col("n_words").cast("double") * lit(1e9))))
      .withColumn("keep", col("entropy_nats") >= lit(keepMinNats))
      .drop("sc")
  }

  /** Per-document average unigram surprisal (nats/token) under a unigram
    * LM FIT from the corpus itself: surprisal(t) = ln(T/cf_t) where cf_t
    * is t's corpus frequency and T the corpus token total. Carried as
    * sur_q = n·qln(T) − Σ c_t·qln(cf_t) (BIGINT, exact);
    * avg = sur_q / (n·1e9).
    *
    * The keep gate is the CCNet band: drop BOTH tails — too-predictable
    * (boilerplate the LM has memorized) and too-surprising (gibberish /
    * wrong-language) documents. The only driver-side state is the 1-row
    * corpus token total (bounded metadata, same contract as the BM25
    * collect); the word dictionary stays distributed.
    */
  def surprisal(docs: DataFrame, keepLoNats: Double, keepHiNats: Double): DataFrame = {
    // Bounded collect: ONE scalar. T equals Σ cf by construction, but a
    // length-arithmetic wordCount scan is far cheaper than the explode.
    val totRow = docs.agg(sum(Text.wordCount(col("text")))).head()
    val tokTotal = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    require(tokTotal > 0, "surprisal: corpus has no words")
    val qlnT = math.floor(math.log(tokTotal.toDouble) * 1e9).toLong

    val cnt = docs
      .select(col("doc_id"), explode(Text.words(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val dict = cnt.groupBy("t").agg(sum("c").as("cf"))
    val per = cnt.join(dict, "t")
      .groupBy("doc_id")
      .agg(sum("c").as("nw"), sum(col("c") * qln(col("cf"))).as("scf"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("nw"), lit(0L)).as("n_words"),
        coalesce(col("scf"), lit(0L)).as("scf"))
      .withColumn("sur_q",
        when(col("n_words") === 0L, lit(0L))
          .otherwise(col("n_words") * lit(qlnT) - col("scf")))
      .withColumn("avg_surprisal",
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("sur_q").cast("double") /
            (col("n_words").cast("double") * lit(1e9))))
      .withColumn("keep",
        col("avg_surprisal") >= lit(keepLoNats) &&
          col("avg_surprisal") <= lit(keepHiNats))
      .drop("scf")
  }

  /** Per-document average BIGRAM surprisal under a bigram LM fit from
    * the corpus: surprisal(w1 w2) = ln(ctx(w1) / cf(w1 w2)), where
    * cf(w1 w2) is the corpus count of the bigram and ctx(w1) the count
    * of bigrams starting with w1. Every scored bigram is by definition
    * in the fit (same corpus), so no smoothing term is needed and
    *
    *   sur_q = Σ c_b · (qln(ctx_{w1}) − qln(cf_b))   (BIGINT, exact)
    *
    * with avg = sur_q / (n_bigrams · 1e9) — one final division, same
    * cross-engine contract as [[surprisal]]. A sharper signal than the
    * unigram LM: templated text repeats whole word PAIRS, so it scores
    * near zero even when its unigram mix looks diverse.
    *
    * Scale: one positional-bigram explode with counts keyed
    * (doc_id, w1, w2); the dictionary joins run on the per-doc-REDUCED
    * count frame, so a corpus-hot bigram costs one row per containing
    * doc. Neither dictionary is ever collected.
    */
  def bigramSurprisal(docs: DataFrame, keepLoNats: Double, keepHiNats: Double): DataFrame = {
    val w = Text.words(col("text"))
    val pairs = when(size(w) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(zip_with(
        slice(w, lit(1), size(w) - 1),
        slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
    val cnt = docs
      .select(col("doc_id"), explode(pairs).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("c"))
    val dictB = cnt.groupBy("w1", "w2").agg(sum("c").as("cfb"))
    val dictC = dictB.groupBy("w1").agg(sum("cfb").as("ctx"))
    val per = cnt.join(dictB, Seq("w1", "w2")).join(dictC, Seq("w1"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("nb"),
        sum(col("c") * (qln(col("ctx")) - qln(col("cfb")))).as("sq"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("sq"), lit(0L)).as("sur_q"))
      .withColumn("avg_surprisal",
        when(col("n_bigrams") === 0L, lit(0.0))
          .otherwise(col("sur_q").cast("double") /
            (col("n_bigrams").cast("double") * lit(1e9))))
      .withColumn("keep",
        col("avg_surprisal") >= lit(keepLoNats) &&
          col("avg_surprisal") <= lit(keepHiNats))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): rank raw-corpus
    * documents by how target-domain-like they are under two unigram
    * LMs — one fit on the `targetSource` slice, one on everything
    * else. Per doc (add-1 smoothed over the JOINT vocabulary V):
    *
    *   imp_q = Σ c_t·(qln(ct_t+1) − qln(cs_t+1))
    *           − n_words·(qln(Tt+V) − qln(Ts+V))     (BIGINT, exact)
    *
    * i.e. the integer-quantized log-likelihood ratio
    * log p_target(doc) − log p_raw(doc). The resampling gate keeps the
    * top half of NON-target docs: imp_q ≥ the interpolated median of
    * non-target scores (binary-exact doubles on integer inputs, so the
    * gate is hash-exact cross-engine). Target docs carry their score
    * with keep = false (they are the reference, not candidates).
    *
    * Scale: the dictionary is vocab-bounded and never collected; both
    * LM fits are one groupBy over the per-doc-reduced count frame; the
    * median rides back as a 1-row equi-join key on the is_target flag
    * (broadcast), never a corpus-wide unpartitioned window.
    */
  def importanceWeights(docs: DataFrame, targetSource: String): DataFrame = {
    val cnt = docs
      .select(col("doc_id"), (col("source") === lit(targetSource)).as("is_target"),
        explode(Text.words(col("text"))).as("t"))
      .groupBy("doc_id", "is_target", "t").agg(count(lit(1)).as("c"))
    val dict = cnt.groupBy("t").agg(
      (coalesce(sum(when(col("is_target"), col("c"))), lit(0L)) + 1L).as("ct1"),
      (coalesce(sum(when(!col("is_target"), col("c"))), lit(0L)) + 1L).as("cs1"))
    // bounded collect: three scalars of LM metadata (V, smoothed totals)
    val totRow = dict.agg(count(lit(1)), sum("ct1"), sum("cs1")).head()
    val (v, tt, ts) = (totRow.getLong(0), totRow.getLong(1), totRow.getLong(2))
    require(v > 0, "importanceWeights: corpus has no words")
    val qTt = math.floor(math.log(tt.toDouble) * 1e9).toLong
    val qTs = math.floor(math.log(ts.toDouble) * 1e9).toLong
    val per = cnt.join(dict, "t")
      .groupBy("doc_id")
      .agg(
        sum("c").as("nw"),
        sum(col("c") * (qln(col("ct1")) - qln(col("cs1")))).as("sll"))
    val scored = docs.select(col("doc_id"),
        (col("source") === lit(targetSource)).as("is_target"))
      .join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("is_target"),
        coalesce(col("nw"), lit(0L)).as("n_words"),
        (coalesce(col("sll"), lit(0L)) -
          coalesce(col("nw"), lit(0L)) * lit(qTt - qTs)).as("imp_q"))
    val med = scored.where(!col("is_target"))
      .agg(percentile(col("imp_q"), lit(0.5)).as("med"))
      .select(lit(false).as("is_target"), col("med"))
    scored.join(broadcast(med), Seq("is_target"), "left")
      .select(col("doc_id"), col("is_target"), col("n_words"), col("imp_q"),
        (!col("is_target") && col("imp_q").cast("double") >= col("med"))
          .as("keep"))
  }
}
