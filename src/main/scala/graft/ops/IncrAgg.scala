package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (materialized-view-style) aggregate maintenance.
  *
  * A 100 TB fact table cannot be re-aggregated per refresh; the engine
  * must keep a per-key aggregate STATE and fold each new delta batch
  * into it. This op maintains the classic mergeable-state quartet
  * (count / sum / min / max — avg derives as sum/count at read time):
  *
  *  - `snapshot` builds the state from raw rows (one shuffle on keys);
  *  - `merge` folds a raw delta into an existing state: the delta is
  *    aggregated to key granularity first (delta-sized shuffle, partial
  *    aggregation map-side), then combined with the state by one more
  *    key-grouped fold of the mergeable fields.
  *
  * Scale shape per refresh: cost is O(delta) + O(|keys|) — the raw
  * history is NEVER rescanned. The state frame is key-unique, so its
  * second-fold partials collapse map-side; pair the stored state with
  * [[graft.sinks.Bucketed]] on the keys and the merge plans
  * exchange-free on the state side. Merging is associative and
  * commutative, so any batching of deltas yields the identical state
  * as one full recompute — which is exactly what the oracle checks.
  */
object IncrAgg {

  /** Aggregate raw rows to per-key state: (keys*, cnt, sum_v, min_v, max_v). */
  def snapshot(raw: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    raw.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold a raw delta batch into an existing state frame. */
  def merge(state: DataFrame, deltaRaw: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    state.unionByName(snapshot(deltaRaw, keys, valueCol))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
}
