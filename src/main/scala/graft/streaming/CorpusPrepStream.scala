package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming twin of the flagship training-data pipeline: documents
  * arrive as files, each micro-batch runs through the SAME batch
  * operators (pipeline.CorpusPrep.clean) via foreachBatch, and cleaned
  * batches append to the corpus store.
  *
  * This is the standard ingest pattern for reusing relational logic in
  * streams — dedup/quality/annotation stay one implementation. Within a
  * micro-batch dedup is exact; cross-batch duplicate suppression is the
  * job of bounded-state streaming dedup (`DedupStream`,
  * dropDuplicatesWithinWatermark), which composes upstream of this.
  */
object CorpusPrepStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Drain all available input (Trigger.AvailableNow), cleaning each
    * micro-batch with the batch pipeline and appending to `outPath`
    * parquet. Returns the materialized result for inspection.
    */
  def runToParquet(spark: SparkSession, dir: String, outPath: String): DataFrame = {
    val checkpoint = java.nio.file.Files.createTempDirectory("prep_ck").toString
    val q = source(spark, dir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val cleaned = graft.pipeline.CorpusPrep.clean(batch.toDF())
        cleaned.write.mode("append").parquet(outPath)
        cleaned.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outPath)
  }
}
