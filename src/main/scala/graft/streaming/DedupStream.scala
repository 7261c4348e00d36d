package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming exact deduplication with bounded state:
  * `dropDuplicatesWithinWatermark` keeps only keys younger than the
  * watermark in the state store, so dedup state does not grow without
  * bound — the streaming twin of Dedup.exact for the ingest path
  * (late duplicates beyond the watermark horizon are admitted; that is
  * the documented trade for bounded state).
  */
object DedupStream {

  /** Dedup a (deliberately doubled, for the spec) event stream on
    * event_id within a 1-hour watermark.
    */
  def dedupEvents(spark: SparkSession, dir: String): DataFrame = {
    val src = EventsStream.source(spark, dir)
    val doubled = src.unionByName(EventsStream.source(spark, dir))
    doubled
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type")
  }
}
