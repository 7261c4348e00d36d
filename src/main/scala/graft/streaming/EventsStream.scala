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

  /** Raw parquet schema of the events table. The physical type of `ts`
    * has changed across testdata generations (TIMESTAMP(NANOS) read as
    * long via nanosAsLong, then TIMESTAMP(MICROS)); streaming sources
    * must declare a schema up front, so it is parameterized by the ts
    * type probed from the files (see [[source]]).
    */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
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
    *
    * The ts physical type is probed with one batch schema read (footer
    * only, no data) so the declared stream schema always matches the
    * files; graft.Tables.normalizeEventTime then maps any generation to
    * the canonical (`ts_ns` long-nanos, `ts` timestamp) pair.
    */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    graft.Tables.normalizeEventTime(
      spark.readStream
        .schema(rawSchema(tsType))
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
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
