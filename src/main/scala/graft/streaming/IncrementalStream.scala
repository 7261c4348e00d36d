package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming ingest dedup against a PERSISTED corpus index: each
  * micro-batch runs [[graft.dedup.Incremental.classifyAndAbsorb]] —
  * classify every new doc exact / near / novel against the index, then
  * absorb the novel docs so later micro-batches dedup against them too.
  *
  * This is the cross-batch complement of [[DedupStream]]: where
  * dropDuplicatesWithinWatermark bounds state by TIME (duplicates
  * beyond the watermark horizon are re-admitted), the incremental index
  * persists the full corpus history OUTSIDE the state store — the
  * streaming state is empty, the index is a table, and a restart
  * resumes from the index on disk. Near-dups are caught, not just
  * exact repeats. One implementation with the batch path: the spec
  * proves the streamed verdicts equal a batch loop over the same
  * micro-batch boundaries.
  */
object IncrementalStream {

  /** Drain `src` (AvailableNow) through classify-then-absorb against
    * the index at `indexDir`, appending verdicts to `outPath` parquet.
    * Returns the accumulated verdicts.
    *
    * Pass a stable `checkpointDir` to make the ingest RESTARTABLE:
    * a rerun resumes from the file-source offsets in the checkpoint and
    * processes only files it has not seen, so docs are classified and
    * absorbed exactly once across restarts (the spec proves a second
    * drain re-reads nothing and a third sees only the new file).
    */
  def runToParquet(spark: SparkSession, src: DataFrame, indexDir: String,
      outPath: String, minEstJaccard: Double = 0.5,
      checkpointDir: String = null): DataFrame = {
    val checkpoint = Option(checkpointDir)
      .getOrElse(java.nio.file.Files.createTempDirectory("inc_ck").toString)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val verdicts = graft.dedup.Incremental.classifyAndAbsorb(
          batch.toDF(), indexDir, minEstJaccard)
        verdicts.write.mode("append").parquet(outPath)
        verdicts.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outPath)
  }
}
