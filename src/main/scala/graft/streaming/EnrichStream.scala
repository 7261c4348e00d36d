package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-static join: streaming events enriched against a static
  * dimension snapshot — the standard ingest-enrichment shape. The dim
  * side is broadcast, so every micro-batch joins map-side with no
  * shuffle of the stream; the static side is re-read per batch only if
  * the source changes (parquet snapshot here: planned once).
  */
object EnrichStream {

  /** Synthetic user dimension derived from customer (user_id 0-149). */
  def userDim(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select((col("c_custkey") % 150).as("user_id"), col("c_nationkey"))
      .groupBy("user_id")
      .agg(min("c_nationkey").cast("long").as("nation"))

  /** ONE implementation of the enrichment aggregate, applied to either a
    * streaming or a batch events frame — the equivalence spec therefore
    * tests the shared code path, not two copies that could drift apart.
    */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim), Seq("user_id"), "left_outer")
      .groupBy("event_type", "nation")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))

  /** Streaming aggregate of event counts/value by (event_type, nation). */
  def enrichedCounts(spark: SparkSession, dir: String): DataFrame =
    enrich(EventsStream.source(spark, dir), userDim(spark, dir))

  /** Batch twin over the same tables, for spec equivalence. */
  def enrichedCountsBatch(spark: SparkSession, dir: String): DataFrame =
    enrich(Tables.events(spark, dir), userDim(spark, dir))
}
