package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming interval-union active time: the twin of the batch sweep
  * (SparkEntry `q_events_active_time`). Groups are (user, day-of-
  * OPENING-event) — the batch clip — and both boundaries of every
  * 5-minute window fold into that group, so each group's sweep closes
  * at zero and the per-group union is exact. The fold accumulates gap
  * time only while the running count is positive, on per-instant net
  * deltas (same-instant order provably irrelevant). State per
  * (user, day) is three longs. A single-batch replay of the finite
  * file source reproduces the batch day-level rows exactly (spec-
  * pinned); across batches the union stays exact as long as a group's
  * boundaries do not regress between batches.
  */
object ActiveTimeStream {

  case class Ev(user_id: Long, day: Long, us: Long)
  case class Active(user_id: Long, day: Long, active_us: Long)
  case class UnionState(lastUs: Long, conc: Long, active: Long)

  val SpanUs: Long = 300L * 1000000L

  def actives(spark: SparkSession, dir: String): Dataset[Active] = {
    import spark.implicits._
    EventsStream.source(spark, dir)
      .select(col("user_id"), expr("ts_ns div 1000").as("us"))
      .select(col("user_id"), expr("us div 86400000000").as("day"), col("us"))
      .as[Ev]
      .groupByKey(e => (e.user_id, e.day))
      .flatMapGroupsWithState[UnionState, Active](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((user, day), events, state: GroupState[UnionState]) =>
          var st = state.getOption.getOrElse(UnionState(Long.MinValue, 0L, 0L))
          val bounds = events.flatMap(e => Seq((e.us, 1L), (e.us + SpanUs, -1L))).toSeq
          bounds.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
            .sortBy(_._1)
            .foreach { case (us, net) =>
              val active =
                if (st.lastUs != Long.MinValue && st.conc > 0L)
                  st.active + (us - st.lastUs)
                else st.active
              st = UnionState(us, st.conc + net, active)
            }
          state.update(st)
          Iterator.single(Active(user, day, st.active))
      }
  }

  /** Drive the finite file source to completion; latest row per group.
    * The update-mode memory sink holds one row per (group, micro-batch)
    * when the file source splits into multiple batches (multiple files /
    * maxFilesPerTrigger), so reduce to the LAST emission per group:
    * `active_us` is non-decreasing within a group across batches (union
    * time only grows), so the last row is exactly max(active_us).
    */
  def runToResult(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runToMemory(spark, actives(spark, dir).toDF(), "active_out", "update")
      .groupBy("user_id", "day")
      .agg(max("active_us").as("active_us"))
}
