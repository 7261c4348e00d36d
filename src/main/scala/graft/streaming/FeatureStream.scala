package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming feature generation: the `flatMapGroupsWithState`
  * twin of the batch per-user lag-feature query (SparkEntry
  * q_events_lag_features). State per user is BOUNDED at four longs —
  * last event time plus a ring of the last 3 quantized values —
  * regardless of how many events the user ever produces; this is the
  * online feature-store shape, where the same features the batch
  * pipeline trains on are computed incrementally at serving time.
  *
  * Within a micro-batch, a user's events are sorted by (ts_ns,
  * event_id) — the batch window's exact order — so a single-batch
  * replay of the file source reproduces the batch output row for row;
  * across batches the carried state makes the fold order-stable as
  * long as event time does not regress between batches (the file
  * source's per-file ordering guarantee; with Kafka, a watermark
  * reorder buffer would front this).
  */
object FeatureStream {

  case class Ev(user_id: Long, event_id: Long, ts_ns: Long, v_c: Long)
  case class Feat(user_id: Long, event_id: Long, v_c: Long,
    lag1_c: Option[Long], gap_s: Option[Long], roll3_c: Option[Long])
  /** lastNs < 0 means "no prior event"; ring holds the most recent ≤ 3
    * quantized values, oldest first.
    */
  case class FeatState(lastNs: Long, ring: Seq[Long])

  def features(spark: SparkSession, dir: String): Dataset[Feat] = {
    import spark.implicits._
    EventsStream.source(spark, dir)
      .where(col("user_id") % 5 === 0)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        round(col("value") * 100, 0).cast("long").as("v_c"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FeatState, Feat](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, events, state: GroupState[FeatState]) =>
          var st = state.getOption.getOrElse(FeatState(-1L, Nil))
          val out = events.toSeq.sortBy(e => (e.ts_ns, e.event_id)).map { e =>
            val f = Feat(e.user_id, e.event_id, e.v_c,
              lag1_c = st.ring.lastOption,
              gap_s = if (st.lastNs < 0) None else Some((e.ts_ns - st.lastNs) / 1000000000L),
              roll3_c = if (st.ring.isEmpty) None else Some(st.ring.sum))
            st = FeatState(e.ts_ns, (st.ring :+ e.v_c).takeRight(3))
            f
          }
          state.update(st)
          out.iterator
      }
  }

  /** Drive the finite file source to completion; one row per event. */
  def runToResult(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runToMemory(spark, features(spark, dir).toDF(), "feat_out", "append")
}
