package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature hashing (Weinberger, Dasgupta, Langford, Smola & Attenberg,
  * "Feature Hashing for Large Scale Multitask Learning", ICML 2009):
  * the in-engine bridge from TEXT to the VECTOR family. Each document
  * becomes a fixed-width sparse integer embedding with no dictionary —
  * token t contributes sign(h(t)) to dimension h(t) mod D, where h is
  * the same xxhash64 kernel the quality model uses (bucket = low 6
  * bits, sign = bit 6 — independent bits of one hash call). The sign
  * hash makes the inner product an unbiased kernel estimate, the whole
  * point of the construction.
  *
  * Scale: one explode + one (doc_id, dim) groupBy — map-side combined,
  * no dictionary state anywhere (that is feature hashing's reason to
  * exist at 100 TB: the vocabulary never materializes). Output at the
  * sparse (doc_id, dim, val) grain; absent dims are implicit zeros,
  * wordless docs vanish.
  */
object FeatureHash {

  val Dim = 64

  def embed(docs: DataFrame): DataFrame = {
    val h = xxhash64(col("t"))
    docs
      .select(col("doc_id"), explode(Text.words(col("text"))).as("t"))
      .select(col("doc_id"),
        h.bitwiseAND(lit((Dim - 1).toLong)).as("dim"),
        when(h.bitwiseAND(lit(Dim.toLong)) === 0L, 1L).otherwise(-1L).as("sgn"))
      .groupBy("doc_id", "dim")
      .agg(sum(col("sgn")).as("val"))
  }

  /** embed() generalized to an arbitrary key tuple — the CHUNK-grain
    * variant used by the RAG pipeline (key = (doc_id, chunk_idx)).
    * Same hash kernel, same sparse output contract, grain = keys+dim.
    */
  def embedKeyed(rows: DataFrame, keys: Seq[String], textCol: String): DataFrame = {
    val h = xxhash64(col("t"))
    rows
      .select(keys.map(col) :+ explode(Text.words(col(textCol))).as("t"): _*)
      .select(keys.map(col) :+
        h.bitwiseAND(lit((Dim - 1).toLong)).as("dim") :+
        when(h.bitwiseAND(lit(Dim.toLong)) === 0L, 1L).otherwise(-1L).as("sgn"): _*)
      .groupBy((keys :+ "dim").map(col): _*)
      .agg(sum(col("sgn")).as("val"))
  }
}
