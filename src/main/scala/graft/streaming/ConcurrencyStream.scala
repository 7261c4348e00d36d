package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming peak-concurrency: the `flatMapGroupsWithState` twin of the
  * batch sweep (SparkEntry `q_events_peak_concurrency`). Each event
  * opens a 5-minute activity window; within a micro-batch the group's
  * +1/−1 boundary deltas are sorted and net-summed per instant — the
  * batch sweep's exact algebra — on top of the carried running count,
  * so a single-batch replay of the finite file source reproduces the
  * batch rows EXACTLY (the spec pins set equality). Across batches the
  * fold stays correct as long as a day's boundaries do not regress
  * between batches (the file source's ordering guarantee; with Kafka a
  * watermark reorder buffer fronts this, same caveat as the other
  * twins). State per day is four longs — running count, peak, first
  * peak instant, and the count of processed boundaries — bounded
  * regardless of event volume.
  */
object ConcurrencyStream {

  case class Bound(day: Long, us: Long, d: Long)
  case class Peak(day: Long, peak: Long, peak_at_us: Long)
  case class SweepState(conc: Long, peak: Long, peakAt: Long, nSeen: Long)

  val SpanUs: Long = 300L * 1000000L

  def peaks(spark: SparkSession, dir: String): Dataset[Peak] = {
    import spark.implicits._
    // each boundary carries its OWN day (a window opened before
    // midnight closes on the next day's sweep) — the batch clip,
    // replayed boundary-for-boundary
    val ev = EventsStream.source(spark, dir).select(expr("ts_ns div 1000").as("us"))
    val bounds = ev.select(col("us"), lit(1L).as("d"))
      .unionByName(ev.select((col("us") + SpanUs).as("us"), lit(-1L).as("d")))
      .select(expr("us div 86400000000").as("day"), col("us"), col("d"))
      .as[Bound]
    bounds
      .groupByKey(_.day)
      .flatMapGroupsWithState[SweepState, Peak](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (day, bs, state: GroupState[SweepState]) =>
          var st = state.getOption.getOrElse(SweepState(0L, Long.MinValue, 0L, 0L))
          // sweep per distinct instant (net sum first, so same-instant
          // ordering provably cannot matter — the batch contract)
          bs.toSeq.groupBy(_.us).view.mapValues(_.map(_.d).sum).toSeq
            .sortBy(_._1)
            .foreach { case (us, net) =>
              val c = st.conc + net
              val (p, at) =
                if (c > st.peak) (c, us) else (st.peak, st.peakAt)
              st = SweepState(c, p, at, st.nSeen + 1L)
            }
          state.update(st)
          Iterator.single(Peak(day, st.peak, st.peakAt))
      }
  }

  /** Drive the finite file source to completion; latest row per day.
    * The update-mode memory sink holds one row per (day, micro-batch)
    * when the file source splits into multiple batches, so reduce to
    * the LAST emission per day: `peak` is non-decreasing across batches
    * and `peak_at_us` only moves when the peak strictly grows, so the
    * last row is exactly the lexicographic max of (peak, peak_at_us).
    */
  def runToResult(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runToMemory(spark, peaks(spark, dir).toDF(), "conc_out", "update")
      .groupBy("day")
      .agg(max(struct(col("peak"), col("peak_at_us"))).as("m"))
      .select(col("day"), col("m.peak").as("peak"), col("m.peak_at_us").as("peak_at_us"))
}
