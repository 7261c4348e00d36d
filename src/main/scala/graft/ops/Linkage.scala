package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-evidence record linkage (the Fellegi–Sunter shape): candidate
  * generation by blocking + bucket-neighborhood probing, per-field
  * agreement weights summed to a match score, then windowless 1-1
  * resolution (best clean record per dirty record) and a
  * precision/recall evaluation against known identity.
  *
  * Where [[Fuzzy.blockedMatch]] is single-field distance-threshold
  * matching, this is the weighted multi-field discipline used for
  * structured entity resolution: each field contributes log-odds-shaped
  * integer evidence (agreement on a rare field counts more than on a
  * common one), and the decision is a threshold on the SUM — robust to
  * any single corrupted field, which is the whole point of linking
  * dirty records.
  *
  * Scale design:
  *  - Candidates come from an equi-join on (blockKey, bucket), with the
  *    dirty side probing bucket±1 via a 3-row explode — the
  *    sorted-neighborhood trick that keeps a numeric field usable as a
  *    blocking key even when its value is perturbed across the bucket
  *    edge. No pair is ever formed outside a block, so there is no n²
  *    term; block sizing is the caller's contract (compose with the
  *    same cap-window discipline as Fuzzy/Dedup if a block can go
  *    viral).
  *  - Scoring is map-side arithmetic on the joined pair frame.
  *  - Resolution is a windowless max(struct(score, -cleanId)) groupBy —
  *    a dirty record with millions of candidates partial-aggregates
  *    map-side instead of hot-keying a window task.
  */
object Linkage {

  /** Candidate pairs: `dirty` × `clean` sharing `blockCol` and with
    * bucket distance ≤ 1 (dirty probes bucket-1, bucket, bucket+1).
    * Both inputs must carry `blockCol` and `bucketCol` (a LONG bucket
    * of the perturbation-prone numeric field, shifted non-negative by
    * the caller so Spark `div` and DuckDB `//` agree). Dirty columns
    * must be disjoint from clean's apart from the two join keys.
    */
  def bucketCandidates(
      dirty: DataFrame, clean: DataFrame,
      blockCol: String, bucketCol: String): DataFrame = {
    val probe = dirty
      .withColumn("__delta", explode(typedLit(Seq(-1L, 0L, 1L))))
      .withColumn(bucketCol, col(bucketCol) + col("__delta"))
      .drop("__delta")
    probe.join(clean, Seq(blockCol, bucketCol))
  }

  /** 1-1 resolution + verdict: per `dirtyId`, the best candidate by
    * (max `score`, min `cleanId`), classified `match` (score ≥
    * matchMin), `possible` (≥ possibleMin) or `unmatched`. Dirty
    * records with no candidate at all resolve to `unmatched` via the
    * left join on `allDirty`. Output: dirtyId, best_id (null when
    * unmatched), score (0 when unmatched), verdict.
    */
  def resolve(
      scored: DataFrame, allDirty: DataFrame, dirtyId: String,
      cleanId: String, score: Column,
      matchMin: Long, possibleMin: Long): DataFrame = {
    val best = scored
      .select(col(dirtyId), score.as("__s"), col(cleanId).as("__c"))
      .where(col("__s") >= possibleMin)
      .groupBy(dirtyId)
      // max score wins; ties go to the SMALLEST clean id (negate inside
      // the struct max) — deterministic, windowless, map-side partial
      .agg(max(struct(col("__s"), (-col("__c")).as("__nc"))).as("__b"))
      .select(col(dirtyId), col("__b.__s").as("score"), (-col("__b.__nc")).as("best_id"))
    allDirty.select(col(dirtyId)).distinct()
      .join(best, Seq(dirtyId), "left")
      .select(col(dirtyId), col("best_id"),
        coalesce(col("score"), lit(0L)).as("score"),
        when(col("score") >= matchMin, lit("match"))
          .when(col("score") >= possibleMin, lit("possible"))
          .otherwise(lit("unmatched")).as("verdict"))
  }

  /** One-row linkage quality report against known identity
    * (`best_id = dirtyId` means the link is correct): dirty/match/
    * possible/correct counts plus trunc-permille precision (correct
    * over claimed matches) and recall (correct over all dirty).
    * All-integer; a single map-side-combined aggregate.
    */
  def evaluate(resolved: DataFrame, dirtyId: String): DataFrame =
    resolved.agg(
      count(lit(1)).as("n_dirty"),
      sum(when(col("verdict") === "match", 1L).otherwise(0L)).as("n_match"),
      sum(when(col("verdict") === "possible", 1L).otherwise(0L)).as("n_possible"),
      sum(when(col("verdict") === "match" && col("best_id") === col(dirtyId), 1L)
        .otherwise(0L)).as("n_correct"))
      .select(col("n_dirty"), col("n_match"), col("n_possible"), col("n_correct"),
        expr("n_correct * 1000 div greatest(n_match, 1)").as("precision_pml"),
        expr("n_correct * 1000 div greatest(n_dirty, 1)").as("recall_pml"))
}
