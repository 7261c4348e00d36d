package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EXACT distinct counting: the `mapGroupsWithState` twin of
  * the batch bitmap-retention operator (SparkEntry
  * q_events_bitmap_retention). State per (day, word) key is ONE long —
  * the 62-bit membership word — so exact DAU at 1e9 users/day costs
  * ~16M keys × 8 bytes ≈ 128 MB of state store per day, with no sketch
  * error anywhere.
  *
  * The fold (bits | e.bit) is associative, commutative, and idempotent
  * — replay-safe under at-least-once delivery, the same merge law the
  * KMV stream pins for its sketches, here with exact semantics. The
  * numeric value of the word grows monotonically under OR (bits are
  * only ever set), which is what lets the harness reduce multi-batch
  * Update-mode output with a plain max().
  */
object BitmapStream {

  case class WordEv(day: Long, word: Long, bit: Long)
  case class WordBits(day: Long, word: Long, bits: Long)

  private val dayNs = 86400000000000L

  def bitmapStream(spark: SparkSession, dir: String): Dataset[WordBits] = {
    import spark.implicits._
    EventsStream.source(spark, dir)
      .select(expr(s"ts_ns div $dayNs").as("day"),
        expr("user_id div 62").as("word"),
        expr("shiftleft(cast(1 as bigint), cast(user_id % 62 as int))").as("bit"))
      .as[WordEv]
      .groupByKey(e => (e.day, e.word))
      .mapGroupsWithState[Long, WordBits](GroupStateTimeout.NoTimeout()) {
        case ((d, w), evs, state: GroupState[Long]) =>
          val bits = evs.foldLeft(state.getOption.getOrElse(0L))((acc, e) => acc | e.bit)
          state.update(bits)
          WordBits(d, w, bits)
      }
  }

  /** Drive the finite file source to completion and reduce Update-mode
    * re-emissions (monotone under OR ⇒ max is the final state) to the
    * per-day exact DAU.
    */
  def dauFromStream(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runToMemory(spark, bitmapStream(spark, dir).toDF(), "bm_out", "update")
      .groupBy("day", "word").agg(max("bits").as("bits"))
      .groupBy("day").agg(expr("cast(sum(bit_count(bits)) as bigint)").as("dau"))
      .orderBy("day")
}
