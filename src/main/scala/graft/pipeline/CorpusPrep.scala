package graft.pipeline

import graft.dedup.Dedup
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flagship composition: a training-data preparation pipeline over a
  * raw document corpus — what the whole engine exists to do at 100 TB.
  *
  * 1. exact dedup (content-hash survivors)
  * 2. near-dup removal (MinHash LSH candidates verified by estimated
  *    jaccard; the lower doc_id of each pair survives)
  * 3. quality gate (word count + uniqueness ratio)
  * 4. annotation (language id, token counts, fingerprint)
  *
  * Every stage is shuffle-on-key or map-side; nothing is pairwise over
  * the corpus and nothing collects to the driver.
  */
object CorpusPrep {

  /** Returns the cleaned, annotated corpus — PERSISTED and materialized
    * (same lifecycle contract as the Dedup candidate functions): the
    * exact-dedup survivor-id set feeds both the near-dup stage and the
    * final anti-join, so it is cached while this runs and released
    * before returning. The caller owns `.unpersist()` of the result.
    */
  def clean(
      docs: DataFrame,
      minWords: Long = 5,
      minEstJaccard: Double = 0.8): DataFrame = {
    // 1. exact dedup: survivor ids — tiny (one long per unique doc), and
    //    reused by stages 2 AND the final anti-join; without the cache the
    //    content-hash aggregation over the full corpus runs three times.
    val survivorIds = Dedup.exact(docs).select(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val survivors = docs.join(survivorIds, Seq("doc_id"), "left_semi")
    // 2. near-dup removal: drop the higher id of each candidate pair
    //    (minhashCandidates materializes eagerly while survivorIds is hot)
    val nearDupCandidates = Dedup.minhashCandidates(survivors, minEstJaccard = minEstJaccard)
    val nearDupLosers = nearDupCandidates
      .select(col("doc_b").as("doc_id"))
      .distinct()
    val unique = survivors.join(nearDupLosers, Seq("doc_id"), "left_anti")
    // 3 + 4. quality gate and annotations
    val annotated = gateAndAnnotate(unique, minWords)
    val out = annotated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize while survivorIds and the candidate set are cached
    survivorIds.unpersist(blocking = false)
    nearDupCandidates.unpersist(blocking = false)
    out
  }

  /** Stages 3+4 of the pipeline — the ONE place the quality thresholds
    * and annotation columns are defined (the oracle-verified twin in
    * SparkEntry reuses this, so its verification covers the real
    * pipeline's gate and annotations).
    */
  def gateAndAnnotate(docs: DataFrame, minWords: Long = 5): DataFrame = {
    val wc = Text.wordCount(col("text"))
    val uniq = when(size(Text.words(col("text"))) === 0, lit(0L))
      .otherwise(size(array_distinct(Text.words(col("text")))).cast("long"))
    docs
      .withColumn("wc", wc)
      .withColumn("uniq_ratio", when(col("wc") === 0, lit(0.0)).otherwise(uniq / col("wc")))
      .where(col("wc") >= minWords && col("uniq_ratio") > 0.1)
      .select(
        col("doc_id"),
        col("lang"),
        Text.langId(col("text")).as("lang_pred"),
        col("wc").as("n_words"),
        Text.bpeTokenCount(col("text")).as("n_tokens"),
        Text.fingerprintMd5(col("text")).as("fingerprint"))
  }
}
