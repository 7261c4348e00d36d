package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twin of the batch events queries: the same
  * tumbling-window aggregation expressed over `readStream`, with a
  * watermark bounding state. At scale this is the ingest path: files
  * (or Kafka) in, hourly aggregates out, state pruned by the watermark.
  */
object EventsStream {

  /** Raw parquet schema of the events table with TIMESTAMP(NANOS) read
    * as long (see Tables.events for the batch-side handling).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos-as-long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over the events parquet in `dir`.
    *
    * nanosAsLong is a deliberate session-level setting (no per-read
    * option exists); see Tables.events for the full rationale. It is a
    * GraftSession default — set here too only so driver-built sessions
    * work.
    */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Watermarked tumbling-window counts per event type — the streaming
    * twin of SparkEntry's q_events_window.
    */
  def hourlyCounts(spark: SparkSession, dir: String): DataFrame =
    source(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("value_cents"))

  /** Run a streaming query to completion over the (finite) file source
    * via the memory sink; returns the collected result table. Used by
    * specs to prove stream/batch equivalence.
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: String = "complete"): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
