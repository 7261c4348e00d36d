package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of `q_events_kmv_distinct`: per-day k-minimum-values
  * sketches maintained in the state store via `mapGroupsWithState`.
  *
  * Each micro-batch folds its new hashes into the day's k-min set —
  * state is BOUNDED at k longs per day (that bound is the whole point
  * of KMV), so a day of a billion events carries the same state as a
  * day of a thousand. The fold is exactly the batch operator's merge
  * property in streaming form: `merge(sketch(A), hashes(B)) =
  * sketch(A ∪ B)`, associative and idempotent, so replays and
  * micro-batch boundaries cannot change the result — the spec pins
  * stream ≡ batch on the same files and the fold law directly.
  */
object KmvStream {

  val K = 16
  private val DayNs = 86400000000000L

  case class DayHash(day: Long, h: Long)
  case class DaySketch(day: Long, n_sketch: Long, kth: Long, est: Long)

  /** Fold new hashes into a k-min sketch: distinct, sorted, first k.
    * Associative/commutative/idempotent in the set it represents.
    */
  def mergeKmin(prev: Array[Long], hashes: Array[Long], k: Int): Array[Long] = {
    val set = new java.util.TreeSet[java.lang.Long]()
    prev.foreach(set.add(_))
    hashes.foreach(set.add(_))
    val out = new Array[Long](math.min(k, set.size))
    val it = set.iterator()
    var i = 0
    while (i < out.length) { out(i) = it.next(); i += 1 }
    out
  }

  def estimate(sketch: Array[Long], k: Int): Long =
    if (sketch.length < k) sketch.length.toLong
    else (k - 1).toLong * 4294967296L / sketch.last

  /** Per-day sketch stream over the events directory. Update-mode
    * output: each micro-batch re-emits the sketches it touched.
    */
  def sketchStream(spark: SparkSession, dir: String, k: Int = K): Dataset[DaySketch] = {
    import spark.implicits._
    val h = shiftrightunsigned(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.Mix64Long(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            col("user_id").cast("long")))), 32)
    EventsStream.source(spark, dir)
      .select(expr(s"ts_ns div $DayNs").as("day"), h.as("h")).as[DayHash]
      .groupByKey(_.day)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (day: Long, it: Iterator[DayHash], state: GroupState[Array[Long]]) =>
          val prev = if (state.exists) state.get else Array.empty[Long]
          val merged = mergeKmin(prev, it.map(_.h).toArray, k)
          state.update(merged)
          DaySketch(day, merged.length.toLong,
            if (merged.nonEmpty) merged.last else 0L, estimate(merged, k))
      }
  }
}
