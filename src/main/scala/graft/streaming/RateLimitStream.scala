package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online sliding-window rate limiting: the `flatMapGroupsWithState`
  * twin of the batch audit (SparkEntry `q_events_rate_limit`, policy
  * "≤ 5 events per rolling 60 s").
  *
  * The batch key's RANGE frame counts timestamp PEERS (events sharing
  * the µs land in each other's windows regardless of order); an online
  * limiter cannot see an event's later-arriving peers, so the
  * streaming contract is the PREFIX variant — each event is judged
  * against strictly-earlier events in the (µs, event_id) total order.
  * On streams without duplicate µs the two definitions agree row-for-
  * row; the spec replays the prefix contract brute-force.
  *
  * State per user is BOUNDED at exactly `limit` timestamps: the
  * accept/reject decision needs only whether the limit-th most recent
  * prior event is still inside the window, so the ring holds the
  * `limit` most recent prior event times and nothing else — a burst of
  * any size cannot grow it. The emitted in-window count saturates at
  * limit+1 accordingly (enough to read off the decision, the point of
  * the serving shape).
  */
object RateLimitStream {

  val Limit = 5
  val WindowUs = 60000000L

  case class Ev(user_id: Long, event_id: Long, ts_ns: Long)
  case class Decision(user_id: Long, event_id: Long, n_in_window_cap: Long, rejected: Boolean)
  /** `ring`: most-recent-first µs of the ≤ Limit latest prior events. */
  case class RlState(ring: List[Long])

  /** Fold one event (µs) into the ring; pure and unit-testable. */
  def step(st: RlState, us: Long): (RlState, (Long, Boolean)) = {
    val priorInWin = st.ring.count(_ > us - WindowUs)
    val rejected = priorInWin >= Limit
    val nCap = math.min(priorInWin, Limit).toLong + 1L
    (RlState((us :: st.ring).take(Limit)), (nCap, rejected))
  }

  def decisions(spark: SparkSession, dir: String): Dataset[Decision] = {
    import spark.implicits._
    EventsStream.source(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RlState, Decision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, events, state: GroupState[RlState]) =>
          var st = state.getOption.getOrElse(RlState(Nil))
          val out = events.toSeq.sortBy(e => (e.ts_ns, e.event_id)).map { e =>
            val (next, (nCap, rej)) = step(st, e.ts_ns / 1000L)
            st = next
            Decision(e.user_id, e.event_id, nCap, rej)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Drive the finite file source to completion. */
  def runToResult(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runToMemory(spark, decisions(spark, dir).toDF(), "ratelimit_out", "append")
}
