package graft.streaming

import graft.ops.IncrAgg
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming materialized view: each micro-batch folds into a PERSISTED
  * per-key aggregate state table via [[graft.ops.IncrAgg.merge]] — the
  * streaming twin of `q_incr_agg`, and the same state-outside-the-
  * state-store design as [[IncrementalStream]]: the stream carries ZERO
  * state-store state, the aggregate lives in a parquet table, and a
  * restart resumes from the table + source offsets. Because merge is
  * associative and commutative, any micro-batch slicing produces the
  * identical state as one batch recompute (spec-proved).
  *
  * Scale shape per micro-batch: O(batch) aggregation + O(|keys|)
  * state fold — raw history is never rescanned, exactly the property
  * that makes a 100 TB-fact-table view refreshable every minute.
  */
object IncrAggStream {

  /** Drain `src` (AvailableNow), folding each micro-batch into the
    * state table at `stateDir`; returns the final state.
    */
  def runToState(spark: SparkSession, src: DataFrame, keys: Seq[String],
      valueCol: String, stateDir: String, checkpointDir: String = null): DataFrame = {
    val checkpoint = Option(checkpointDir)
      .getOrElse(java.nio.file.Files.createTempDirectory("incagg_ck").toString)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val hasState = new java.io.File(stateDir).exists()
        val merged =
          if (hasState) IncrAgg.merge(spark.read.parquet(stateDir), batch.toDF(), keys, valueCol)
          else IncrAgg.snapshot(batch.toDF(), keys, valueCol)
        // snapshot BEFORE overwriting the path the plan reads from —
        // a lazy plan would re-read the state table it is replacing
        val snap = merged.localCheckpoint(true)
        snap.write.mode("overwrite").parquet(stateDir)
        snap.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(stateDir)
  }
}
