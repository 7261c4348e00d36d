package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, stratified, repartition-stable sampling.
  *
  * `rand()`-based sampling is neither reproducible across retries nor
  * stable under repartitioning — a training-data pipeline needs the SAME
  * sample on every run and every cluster layout. Instead each row's fate
  * is a pure function of its key: the first byte-pair of md5(key) is
  * compared against a per-stratum hex threshold, so the sample is exact,
  * shuffle-free (map-side filter), and reproducible in any engine with
  * md5 (the oracle mirrors it 1:1 in DuckDB).
  */
object Sample {

  /** Keep a row iff substring(md5(key), 1, 2) < threshold(stratum).
    * `rates` maps stratum value -> admission fraction in [0,1]; rows in
    * strata absent from `rates` get `defaultRate`. Fractions quantize to
    * 1/256 steps (two hex chars).
    */
  def stratified(
      df: DataFrame,
      keyCol: Column,
      stratumCol: Column,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    def hexThreshold(rate: Double): String = {
      val steps = math.max(0, math.min(256, math.round(rate * 256))).toInt
      // 256 steps = keep everything: use a sentinel above any hex pair
      // ("%02x" of 256 would be the 3-char "100", which string-compares
      // BELOW "ab" and would keep nothing).
      if (steps == 256) "g" else f"$steps%02x"
    }
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (els, (stratum, rate)) =>
        when(stratumCol === stratum, lit(hexThreshold(rate))).otherwise(els)
    }
    df.where(substring(md5(keyCol.cast("string")), 1, 2) < threshold)
  }

  /** Exact-quota sampling: the first `n` rows per stratum in md5-of-key
    * order — deterministic, repartition-stable, and exactly sized (where
    * rate-based sampling only hits the quota in expectation). One
    * shuffle on the stratum (window), bounded output.
    */
  def quotaPerStratum(
      df: DataFrame,
      keyCol: Column,
      stratumCol: Column,
      n: Int): DataFrame = {
    require(n > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(md5(keyCol.cast("string")), keyCol) // key tiebreak for md5 ties
    // collision-checked temp column: a plain "__rn" would silently
    // replace (and then drop) a caller column of the same name
    val rn = "__graft_quota_rn"
    require(!df.columns.contains(rn), s"input already has a $rn column")
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) <= n)
      .drop(rn)
  }
  /** Per-domain document cap: keep the top `n` documents of each source
    * domain ranked by canonical word count (quality proxy; doc_id
    * tiebreak) — the anti-spam stage that stops one viral domain from
    * dominating a training corpus. Routed through the bounded-heap
    * TopKPerKey operator rather than a row_number window: a viral
    * domain would make the window's partition-by a hot key (every one
    * of its documents in one task), where the two-phase heaps cap
    * per-task state at domains x n and bound the shuffle the same way.
    */
  def domainCap(docs: DataFrame, n: Int): DataFrame = {
    require(n > 0)
    val scored = docs
      .where(col("text").isNotNull)
      .select(
        col("doc_id"),
        col("source"),
        graft.text.Text.wordCount(col("text")).as("wc"))
    graft.plans.TopK.perKey(scored, Seq("source"), Seq("wc" -> true, "doc_id" -> false), n)
  }

}
