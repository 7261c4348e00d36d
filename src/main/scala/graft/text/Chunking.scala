package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window preparation for training pipelines: split documents
  * into fixed word windows, and pack documents into token-budget groups.
  *
  * Both ops are map-side / single-shuffle and declarative:
  *  - chunking is a per-row array transform + explode (no shuffle; at
  *    100 TB it streams through the scan),
  *  - packing is one window aggregation per stream key (one shuffle on
  *    the stream key, reusing Spark's running-sum window machinery).
  */
object Chunking {

  /** Explode each document into `windowWords`-word chunks (stride =
    * window, no overlap). Output: input columns in `keep` + (chunk_idx,
    * chunk_text, n_words). Documents with no canonical words produce no
    * chunks.
    *
    * The words array and chunk count are bound ONCE per row via the
    * single-element-array let-binding (see Text.shingles) — naively
    * referencing `words(text)` inside the chunk lambda would re-split
    * the text once per chunk.
    */
  def chunkByWords(
      docs: DataFrame,
      windowWords: Int,
      textCol: String = "text",
      keep: Seq[String] = Seq("doc_id")): DataFrame = {
    require(windowWords > 0, "windowWords must be positive")
    // NULL text must yield no chunks — without this filter the null
    // propagates through size()/greatest()/least() (which SKIP nulls,
    // so greatest(null - 1, 0) = 0) and fabricates one phantom chunk
    // with chunk_text = NULL and n_words = windowWords.
    val nonNull = docs.where(col(textCol).isNotNull)
    val chunksCol: Column = element_at(
      transform(
        array(Text.words(col(textCol))),
        w => {
          val nChunks = floor((size(w) + (windowWords - 1)) / lit(windowWords.toDouble)).cast("int")
          transform(
            sequence(lit(0), greatest(nChunks - 1, lit(0))),
            i => struct(
              i.cast("long").as("chunk_idx"),
              array_join(slice(w, i * windowWords + 1, lit(windowWords)), " ").as("chunk_text"),
              least(size(w) - i * windowWords, lit(windowWords)).cast("long").as("n_words")))
        }),
      1)
    nonNull
      .select(keep.map(col) :+ explode(chunksCol).as("c"): _*)
      .select(keep.map(col) :+ col("c.chunk_idx") :+ col("c.chunk_text") :+ col("c.n_words"): _*)
      .where(col("n_words") > 0)
  }

  /** Greedy sequential packing: within each `streamCol` group, documents
    * (in `orderCol` order) are assigned to packs of ~`budget` tokens by
    * running token total — pack p holds the docs whose cumulative count
    * falls in (p*budget, (p+1)*budget]. The classic distributed
    * formulation of context-window packing: a running-sum window, no
    * driver loop, one shuffle on the stream key.
    */
  def packByBudget(
      docs: DataFrame,
      tokensCol: Column,
      budget: Long,
      streamCol: String = "source",
      orderCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(streamCol)
      .orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .withColumn("n_tokens", tokensCol)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // greatest() guards cum=0 (a leading zero-token doc): Spark `div`
      // truncates toward zero while SQL `//` floors, so keep the
      // numerator non-negative for cross-engine parity.
      .withColumn("pack_id", expr(s"(greatest(cum_tokens, 1) - 1) div $budget"))
  }

  /** Content-defined chunking (Rabin/gear-style CDC, the storage-dedup
    * primitive): a chunk boundary falls wherever `xxhash64(word)` masks
    * to zero in its low `maskBits` bits, so boundaries depend ONLY on
    * local content — insert one sentence into a document and every
    * other chunk's identity is preserved, which is exactly why CDC
    * beats fixed windows for dedup of re-crawled/near-identical pages.
    * Expected chunk length is 2^maskBits words.
    *
    * Output: one row per (doc, chunk): `keep` columns + (chunk_id,
    * n_words, chunk, h) where `h` = md5(chunk) — downstream dedup
    * should group/join on `h`, never on the chunk text (the
    * hash-before-shuffle rule: 32 hex bytes of shuffle key instead of
    * the full chunk payload).
    *
    * Scale shape: one posexplode (map-side), one per-document
    * running-sum window (partition bounded by document length), one
    * (doc, chunk_id) reassembly groupBy. Nothing corpus-global until
    * the caller's own dedup join over `h`.
    */
  def cdcChunks(
      docs: DataFrame,
      maskBits: Int = 4,
      keep: Seq[String] = Seq("doc_id", "source")): DataFrame = {
    require(maskBits >= 1 && maskBits <= 20, s"maskBits out of range: $maskBits")
    val mask = (1L << maskBits) - 1L
    val pos = docs
      .select(keep.map(col) :+ posexplode(Text.words(col("text"))): _*)
      .select(keep.map(col) :+ (col("pos") + 1).cast("long").as("i")
        :+ col("col").as("wd"): _*)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    pos
      .withColumn("bf",
        when(xxhash64(col("wd")).bitwiseAND(lit(mask)) === 0L, 1L).otherwise(0L))
      .withColumn("chunk_id", sum(col("bf")).over(byDoc))
      .groupBy(keep.map(col) :+ col("chunk_id"): _*)
      .agg(count(lit(1)).as("n_words"),
        array_join(
          transform(sort_array(collect_list(struct(col("i"), col("wd")))),
            s => s.getField("wd")), " ").as("chunk"))
      .withColumn("h", md5(col("chunk")))
  }
}
