package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Mix64

/** Hashed linear quality classifier — the fastText-style scoring head
  * every corpus-quality pipeline ends with: tokens hash into a fixed
  * feature table, the document score is the sum of its tokens' weights,
  * and a threshold turns the score into a keep flag.
  *
  * The weight table here is a deterministic seeded stand-in (no trained
  * models ship in this container); swapping in trained weights changes
  * ONLY the array literal. Everything that matters at scale is real:
  * the table rides along as a 64-element literal inside whole-stage
  * codegen (zero network cost — not even a broadcast), tokens never
  * leave their row, and scoring is strictly map-side: at 100 TB this
  * operator adds no shuffle at all to a corpus pass.
  *
  * Integer micro-unit weights keep the fold exact, so Spark and the
  * DuckDB oracle (which re-implements the xxhash64 token kernel —
  * [[graft.oracle.DuckHash.qualityModelSql]]) hash-match bit-for-bit.
  */
object QualityModel {

  /** Feature-table size; power of two so the bucket is a bit-mask. */
  val dim = 64

  /** Deterministic placeholder weights in integer micro-units,
    * range [-1000, 1000] (SplitMix64 over the seed — public kernel).
    */
  def weightsMicro(seed: Long = 0x51EDE5L): Array[Long] =
    Array.tabulate(dim)(i => Math.floorMod(Mix64(seed + i), 2001L) - 1000L)

  /** Feature bucket of a token: low bits of xxhash64 (mask keeps the
    * signed/unsigned question moot — low bits match in both engines).
    */
  def bucket(token: Column): Column = xxhash64(token).bitwiseAND(lit((dim - 1).toLong))

  /** Score `docs(doc_id, text)`: (doc_id, n_toks, score_micro, keep).
    * Map-side only; `keep` = positive score.
    */
  def scored(docs: DataFrame, weights: Array[Long]): DataFrame = {
    require(weights.length == dim, s"expected $dim weights, got ${weights.length}")
    val wlit = array(weights.map(lit): _*)
    docs
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_toks"),
        aggregate(
          transform(col("w"), t => element_at(wlit, (bucket(t) + lit(1L)).cast("int"))),
          lit(0L), (acc, x) => acc + x).as("score_micro"))
      .withColumn("keep", col("score_micro") > 0L)
  }
}
