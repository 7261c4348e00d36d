package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Linear multi-touch attribution: each conversion's value splits
  * equally across the user's touch events inside the lookback window
  * `[conv_ts - lookback, conv_ts]`; a touch's credit is the sum of its
  * shares from conversions in `[touch_ts, touch_ts + lookback]` (the
  * same association read from the other side).
  *
  * Shape: TWO range-frame windows over ONE (user, time) sort — the
  * exchange is reused between them, so the whole operator is a single
  * shuffle on user_id regardless of corpus size; no self-join of the
  * events table (the naive conversions⋈touches interval join shuffles
  * the fact twice and explodes hot users quadratically).
  *
  * Determinism: per-conversion shares are truncating integer divisions
  * of cent values, credits are integer sums — order-independent and
  * oracle-exact. Conversions with zero in-window touches keep their
  * value unattributed (no synthetic "direct" touch is invented).
  */
object Attribution {

  /** Per-touch credit rows: (user, ts, touch_type, credit_cents).
    * `valueCents` is the conversion-value column in integer cents.
    */
  def linear(
      events: DataFrame,
      touchTypes: Seq[String],
      convType: String,
      lookbackNs: Long,
      valueCents: Column,
      userCol: String = "user_id",
      tsCol: String = "ts_ns"): DataFrame = {
    require(lookbackNs > 0, "lookback must be positive")
    val isTouch = col("event_type").isin(touchTypes: _*)
    val isConv = col("event_type") === convType
    val ev = events.where(isTouch || isConv)
      .select(col(userCol), col(tsCol), col("event_type"),
        when(isTouch, lit(1L)).as("touch_flag"),
        when(isConv, valueCents).as("conv_cents"))
    val byTime = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val wPrev = byTime.rangeBetween(-lookbackNs, 0)
    val wNext = byTime.rangeBetween(0, lookbackNs)
    ev
      .withColumn("n_touch", count(col("touch_flag")).over(wPrev))
      .withColumn("unit",
        when(col("conv_cents").isNotNull && col("n_touch") > 0,
          expr("conv_cents div n_touch")))
      .withColumn("credit_cents", sum(col("unit")).over(wNext))
      .where(col("touch_flag").isNotNull)
      .select(col(userCol), col(tsCol), col("event_type").as("touch_type"),
        coalesce(col("credit_cents"), lit(0L)).as("credit_cents"))
  }
}
