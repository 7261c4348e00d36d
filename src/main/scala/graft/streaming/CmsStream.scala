package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming count-min sketch — the mergeability argument made
  * executable: CMS cells are pure counters, so the streaming twin
  * maintains the SAME 4×64 cell table as the batch key
  * (`q_events_cms_heavy`) with a complete-mode aggregate whose state is
  * EXACTLY 256 rows regardless of corpus size — the whole point of
  * sketching on an ingest path. Probing happens at the publish
  * boundary against the maintained cells (the DpStream release-boundary
  * contract). CmsStreamSpec pins streamed cells ≡ batch cells.
  */
object CmsStream {

  private def bucket(keyTimes4PlusI: org.apache.spark.sql.Column) = {
    val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Mix64Long(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(keyTimes4PlusI)))
    shiftrightunsigned(h, 32) % 64L
  }

  /** The maintained state: 4×64 sketch cells over the event stream. */
  def cells(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runToMemory(
      spark,
      EventsStream.source(spark, dir)
        .select(col("user_id"), explode(sequence(lit(0L), lit(3L))).as("i"))
        .select(col("i"), bucket(col("user_id") * 4L + col("i")).as("b"))
        .groupBy("i", "b").agg(count(lit(1)).as("cnt")),
      "cms_stream_cells", "complete")

  /** Publish-time probe of one key against the maintained cells. */
  def estimate(cellsDf: DataFrame, userId: Long): Long = {
    val probes = (0L to 3L).map { i =>
      (i, (graft.functions.Mix64(userId * 4 + i) >>> 32) % 64)
    }
    val m = cellsDf.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    probes.map(p => m.getOrElse(p, 0L)).min
  }
}
