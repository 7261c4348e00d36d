package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Blocked fuzzy matching (edit-distance entity resolution) — the
  * dimension-cleanup step every warehouse load eventually needs:
  * match dirty incoming names against a reference dimension without a
  * cartesian product.
  *
  * Candidates pair ONLY inside a shared block key (a substring of the
  * name), so the join is a hash equi-join on the block; Levenshtein
  * runs on block-local pairs. Oversized blocks (a degenerate blocking
  * key — the fuzzy-match analog of a viral LSH bucket) are dropped via
  * one count-window pass with the SAME cap discipline as
  * dedup.Dedup's banded join, so no block can go quadratic at scale.
  * Levenshtein is identical in Spark and DuckDB → oracle-exact.
  */
object Fuzzy {

  /** Match `probe(probeKey, probeCol)` rows against
    * `ref(refKey, refCol)`: pairs sharing `substring(blockStart,
    * blockLen)` with edit distance <= maxDist. Blocks with more than
    * `blockCap` REF members are dropped (loud in the doc, bounded in
    * the plan).
    */
  def blockedMatch(
      probe: DataFrame, probeKey: String, probeCol: String,
      ref: DataFrame, refKey: String, refCol: String,
      blockStart: Int, blockLen: Int, maxDist: Int,
      blockCap: Int = 10000): DataFrame = {
    val p = probe.select(col(probeKey), col(probeCol),
      substring(col(probeCol), blockStart, blockLen).as("block"))
    val r0 = ref.select(col(refKey), col(refCol),
      substring(col(refCol), blockStart, blockLen).as("block"))
    val r = r0
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("block"))))
      .where(col("__bn") <= blockCap)
      .drop("__bn")
    p.join(r, Seq("block"))
      .select(col(probeKey), col(refKey),
        levenshtein(col(probeCol), col(refCol)).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }
}
