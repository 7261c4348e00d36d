package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming Bloom membership — the ingest twin of `q_bloom_fpr_eval`'s
  * batch filter, and the mergeability argument for the MEMBERSHIP
  * sketch: Bloom bits are pure ORs, so the streaming state is the
  * occupied-bit table itself — a complete-mode aggregate bounded at
  * m = 4096 rows REGARDLESS of corpus size (the CmsStream contract
  * applied to membership). The stream absorbs event user ids; probes
  * happen at the publish boundary against the maintained bits, so a
  * live dedup/anti-join prefilter can consult the filter while the
  * stream runs. BloomStreamSpec pins streamed bits ≡ the batch bit set
  * over the same keys and the no-false-negative law.
  */
object BloomStream {

  val bits = 4096L
  val hashes = 4L

  private def bucket(c: org.apache.spark.sql.Column) = {
    val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Mix64Long(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
    shiftrightunsigned(h, 32) % bits
  }

  /** The maintained state: occupied bit positions (with absorb counts —
    * a counting Bloom for free, which is what a deletable filter needs).
    */
  def occupiedBits(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runToMemory(
      spark,
      EventsStream.source(spark, dir)
        .select(col("user_id"), explode(sequence(lit(0L), lit(hashes - 1))).as("i"))
        .select(bucket(col("user_id") * hashes + col("i")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("cnt")),
      "bloom_stream_bits", "complete")

  /** Snapshot the maintained bits once (bounded at m = 4096 rows) so a
    * batch of probes pays ONE collect, not one per key.
    */
  def snapshotBits(bitsDf: DataFrame): Set[Long] =
    bitsDf.collect().map(_.getLong(0)).toSet

  /** Membership probe against a snapshotted bit set — pure driver math,
    * no Spark action per key.
    */
  def mightContain(occupied: Set[Long], key: Long): Boolean =
    (0L until hashes).forall { i =>
      occupied.contains((graft.functions.Mix64(key * hashes + i) >>> 32) % bits)
    }

  /** Publish-time membership probe against the maintained bits. Thin
    * wrapper for one-off probes; batch callers should [[snapshotBits]]
    * once and probe the Set — the DataFrame overload pays an O(m)
    * collect per call.
    */
  def mightContain(bitsDf: DataFrame, key: Long): Boolean =
    mightContain(snapshotBits(bitsDf), key)

  /** The batch twin of the streamed state, for equivalence specs. */
  def batchBits(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("user_id"), explode(sequence(lit(0L), lit(hashes - 1))).as("i"))
      .select(bucket(col("user_id") * hashes + col("i")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))
}
