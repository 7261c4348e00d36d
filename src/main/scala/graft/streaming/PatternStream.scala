package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online CEP pattern matching: the `flatMapGroupsWithState` twin of
  * the batch negative-condition pattern (SparkEntry `q_events_pattern`,
  * "purchase matches iff the most recent prior view is within 30 min
  * AND no error fired between view and purchase") — the streaming
  * MATCH_RECOGNIZE shape, detection AT INGEST instead of in a nightly
  * batch.
  *
  * State per user is two timestamps (last view, last error) — O(1)
  * REGARDLESS of stream length; a burst of any size cannot grow it.
  * The fold is identical to the batch key's keyed-window semantics
  * under the same (ts, event_id) total order, so on a finite stream
  * the per-user match counts equal the batch frame row-for-row
  * (PatternStreamSpec pins it).
  */
object PatternStream {

  val WindowNs = 30L * 60L * 1000000000L

  case class Ev(user_id: Long, event_id: Long, event_type: String, ts_ns: Long)
  case class Match(user_id: Long, event_id: Long, ts_ns: Long, matched: Boolean)
  case class PatState(lastView: Option[Long], lastError: Option[Long])

  /** Fold one event; pure and unit-testable. Emits a decision only for
    * purchases.
    */
  def step(st: PatState, e: Ev): (PatState, Option[Match]) = {
    val out =
      if (e.event_type == "purchase") {
        val ok = st.lastView.exists(v => e.ts_ns - v <= WindowNs &&
          st.lastError.forall(_ < v))
        Some(Match(e.user_id, e.event_id, e.ts_ns, ok))
      } else None
    val next = e.event_type match {
      case "view" => st.copy(lastView = Some(e.ts_ns))
      case "error" => st.copy(lastError = Some(e.ts_ns))
      case _ => st
    }
    (next, out)
  }

  def matches(spark: SparkSession, dir: String): Dataset[Match] = {
    import spark.implicits._
    EventsStream.source(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_ns"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PatState, Match](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, events, state: GroupState[PatState]) =>
          var st = state.getOption.getOrElse(PatState(None, None))
          val out = events.toSeq.sortBy(e => (e.ts_ns, e.event_id)).flatMap { e =>
            val (next, m) = step(st, e)
            st = next
            m
          }
          state.update(st)
          out.iterator
      }
  }
}
