package graft.dedup

import graft.functions.exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents that share
  * word n-grams with a held-out evaluation set — the standard
  * decontamination pass before LLM training.
  *
  * Scale shape: the eval side reduces to a DISTINCT set of gram hashes —
  * tiny next to the corpus — and is broadcast; the corpus side explodes
  * grams map-side and inner-joins the broadcast set, then aggregates
  * per doc with map-side combine. One shuffle (the per-doc count), no
  * pairwise doc×doc work, corpus scanned once.
  *
  * Grams are 64-bit ShingleBlock hashes; equality of hash grams matches
  * equality of string grams up to ~1e-15 collisions per pair.
  */
object Contamination {

  /** Per-corpus-doc count of distinct `gramK`-grams shared with
    * `evalDocs`. Only contaminated docs (n_shared >= 1) are returned.
    */
  def sharedGrams(corpus: DataFrame, evalDocs: DataFrame, gramK: Int = 5): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col("doc_id"), exprs.shingle_block(col("text"), gramK).as("b"))
      .where(col("b").isNotNull)
      .select(col("doc_id"), explode(col("b.sh")).as("gram"))
    val evalGrams = grams(evalDocs).select("gram").distinct()
    grams(corpus)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared")) // grams are distinct per doc (ShingleBlock dedupes)
  }
}
