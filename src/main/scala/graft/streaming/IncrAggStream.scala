package graft.streaming

import graft.ops.IncrAgg
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming materialized view: each micro-batch folds into a PERSISTED
  * per-key aggregate state table via [[graft.ops.IncrAgg.merge]] — the
  * streaming twin of `q_incr_agg`, and the same state-outside-the-
  * state-store design as [[IncrementalStream]]: the stream carries ZERO
  * state-store state, the aggregate lives in a parquet table, and a
  * restart resumes from the table + source offsets. Because merge is
  * associative and commutative, any micro-batch slicing produces the
  * identical state as one batch recompute (spec-proved).
  *
  * Exactly-once across crashes: foreachBatch is at-least-once — a kill
  * between the state write and the checkpoint commit REPLAYS the batch
  * on restart, and a naive fold would double-count it. The state is
  * therefore versioned by batchId with an atomic commit pointer:
  *   1. merged state for batch b writes to `stateDir/v<b>` (reading
  *      from the previous version — never the path being written, so
  *      no self-read snapshot is needed);
  *   2. the commit is an ATOMIC_MOVE pointer flip of `stateDir/LATEST`
  *      to b; superseded versions are GC'd after the flip.
  * A replayed batchId <= LATEST is skipped (fold already committed); a
  * crash before the flip leaves LATEST on the previous version, and the
  * replay recomputes `v<b>` from it — either way each batch's rows are
  * folded into the committed state exactly once (spec kills a run
  * mid-batch and proves convergence).
  *
  * Scale shape per micro-batch: O(batch) aggregation + O(|keys|)
  * state fold — raw history is never rescanned, exactly the property
  * that makes a 100 TB-fact-table view refreshable every minute.
  */
object IncrAggStream {

  private def latestApplied(stateDir: String): Option[Long] = {
    val p = Paths.get(stateDir, "LATEST")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Read the committed state (the version LATEST points at). */
  def readState(spark: SparkSession, stateDir: String): DataFrame = {
    val v = latestApplied(stateDir).getOrElse(
      throw new IllegalStateException(s"no committed state under $stateDir"))
    spark.read.parquet(s"$stateDir/v$v")
  }

  /** Fold one micro-batch into the versioned state, exactly once per
    * batchId (see the commit protocol in the object doc). Idempotent
    * under replay: a batchId at or below the committed pointer is a
    * no-op. `onBeforeCommit` runs between the version write and the
    * pointer flip — the spec's crash-injection seam (a fault there
    * leaves an uncommitted version dir, which the replay overwrites).
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      keys: Seq[String], valueCol: String, stateDir: String,
      onBeforeCommit: () => Unit = () => ()): Unit = {
    Files.createDirectories(Paths.get(stateDir))
    val applied = latestApplied(stateDir)
    if (applied.exists(_ >= batchId)) return // replayed: already committed
    val merged = applied match {
      case Some(v) => IncrAgg.merge(spark.read.parquet(s"$stateDir/v$v"), batch, keys, valueCol)
      case None    => IncrAgg.snapshot(batch, keys, valueCol)
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
    onBeforeCommit()
    val tmp = Files.createTempFile(Paths.get(stateDir), "latest", ".tmp")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, Paths.get(stateDir, "LATEST"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // GC the superseded version — after the flip, so a crash here only
    // leaves one stale dir for the next fold's GC, never a torn state
    applied.foreach(v =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$stateDir/v$v")))
  }

  /** Drain `src` (AvailableNow), folding each micro-batch into the
    * state table at `stateDir`; returns the final committed state.
    * Pass a stable `checkpointDir` to make the fold RESTARTABLE: a
    * rerun resumes from the source offsets and replayed batches are
    * skipped by the batchId pointer.
    */
  def runToState(spark: SparkSession, src: DataFrame, keys: Seq[String],
      valueCol: String, stateDir: String, checkpointDir: String = null,
      onBeforeCommit: () => Unit = () => ()): DataFrame = {
    val checkpoint = Option(checkpointDir)
      .getOrElse(java.nio.file.Files.createTempDirectory("incagg_ck").toString)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        applyBatch(spark, batch.toDF(), batchId, keys, valueCol, stateDir, onBeforeCommit)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    readState(spark, stateDir)
  }
}
