package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join: purchase events attributed to the
  * signup they follow within one hour — the canonical two-stream
  * correlation shape (click→conversion, request→response).
  *
  * Scale shape: both sides are watermarked, so the join buffers only
  * rows inside the watermark horizon — state is bounded by stream rate x
  * window, not stream length. The event-time range condition lets Spark
  * prune each side's buffer as the watermark advances; without it a
  * stream-stream join would buffer forever. Matches emit in append mode
  * as soon as both sides arrive (no end-of-window wait).
  */
object JoinStream {

  /** ONE implementation of the interval-join logic for both streaming
    * and batch frames (watermarks are no-ops in batch), so the
    * equivalence spec exercises the shared code path. Inputs need
    * (event_id, user_id, event_type, ts: timestamp).
    */
  def attribution(signups: DataFrame, purchases: DataFrame): DataFrame = {
    val s = signups
      .where(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    // the purchase watermark must cover the join range (1h) plus slack;
    // 2h keeps late purchases joinable against still-buffered signups
    val p = purchases
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    s.join(p, expr("user_id = p_user AND p_ts > s_ts AND p_ts <= s_ts + interval 1 hour"))
      .select(
        col("s_id"),
        col("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("s_ts"))).as("lag_us"))
  }

  /** Streaming attribution over two independent readStream sources. */
  def attributionStream(spark: SparkSession, dir: String): DataFrame =
    attribution(EventsStream.source(spark, dir), EventsStream.source(spark, dir))

  /** Batch twin over the same table, for spec equivalence. */
  def attributionBatch(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(spark, dir), Tables.events(spark, dir))
}
