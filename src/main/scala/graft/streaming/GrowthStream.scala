package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming FIRST-SEEN user growth: the `mapGroupsWithState` twin of
  * the batch user-growth curve (SparkEntry q_events_user_growth's
  * new-users leg). State per user is ONE long — the smallest event day
  * seen so far — so the audience-growth dashboard at 1e9 lifetime users
  * costs 8 GB of state store total, flat forever (users are touched,
  * never re-counted; no per-day blowup because first-seen is a
  * lifetime property, not a windowed one).
  *
  * The fold (min of days) is associative, commutative, and idempotent —
  * replay-safe under at-least-once delivery. The emitted first-day is
  * monotone non-increasing per user across batches (late data can only
  * move a first-seen EARLIER), so the harness reduces Update-mode
  * re-emissions with a plain min() and the result equals the batch
  * min-day-per-user exactly.
  */
object GrowthStream {

  case class UserDay(user_id: Long, day: Long)

  private val dayNs = 86400000000000L

  def firstSeenStream(spark: SparkSession, dir: String): Dataset[UserDay] = {
    import spark.implicits._
    EventsStream.source(spark, dir)
      .select(col("user_id"), expr(s"ts_ns div $dayNs").as("day"))
      .as[UserDay]
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, UserDay](GroupStateTimeout.NoTimeout()) {
        case (user, evs, state: GroupState[Long]) =>
          val first = evs.foldLeft(state.getOption.getOrElse(Long.MaxValue))(
            (acc, e) => math.min(acc, e.day))
          state.update(first)
          UserDay(user, first)
      }
  }

  /** Drive the finite file source to completion, reduce Update-mode
    * re-emissions (monotone under min), and fold to the per-day
    * new-user counts — the stream-side twin of the batch curve.
    */
  def newUsersFromStream(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runToMemory(spark, firstSeenStream(spark, dir).toDF(), "growth_out", "update")
      .groupBy("user_id").agg(min("day").as("first_day"))
      .groupBy("first_day").agg(count(lit(1)).as("new_users"))
      .orderBy("first_day")
}
