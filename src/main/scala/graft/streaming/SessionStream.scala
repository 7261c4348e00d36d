package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the `flatMapGroupsWithState`
  * counterpart of the batch window-lag sessionizer (SparkEntry
  * q_events_session). State per user = (last event ns, open session
  * count, total events); sessions close when the gap exceeds
  * `gapNs`. At scale the state store is RocksDB-backed and bounded by
  * active users; with event-time timeout, idle users age out.
  */
object SessionStream {

  case class Ev(user_id: Long, ts_ns: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)
  case class SessState(lastNs: Long, sessions: Long, events: Long)

  val defaultGapNs: Long = 1800L * 1000 * 1000 * 1000

  def sessionize(spark: SparkSession, dir: String, gapNs: Long = defaultGapNs): Dataset[UserSessions] = {
    import spark.implicits._
    EventsStream.source(spark, dir)
      .select(col("user_id"), col("ts_ns"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, UserSessions](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, events, state: GroupState[SessState]) =>
          val sorted = events.toSeq.sortBy(_.ts_ns)
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = st.lastNs == Long.MinValue || e.ts_ns - st.lastNs > gapNs
            st = SessState(e.ts_ns, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator.single(UserSessions(uid, st.sessions, st.events))
      }
  }

  /** Drive to completion over the finite file source; returns the final
    * per-user row (last update wins when multiple batches fire).
    */
  def runToResult(spark: SparkSession, dir: String): DataFrame = {
    val out = EventsStream.runToMemory(spark, sessionize(spark, dir).toDF(), "sessions_out", "append")
    // keep the last emitted row per user (re-emissions supersede)
    out.groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
      .orderBy("user_id")
  }
}
