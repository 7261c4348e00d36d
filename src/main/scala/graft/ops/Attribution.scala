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

  /** Position-based (U-shaped) attribution: within each conversion's
    * lookback window the FIRST touch gets 40% of the value, the LAST
    * touch 40%, and the remaining 20% splits equally across the middle
    * touches (n=1 → the lone touch takes 100%; n=2 → 50/50). The
    * industry-standard U curve that linear() deliberately flattens.
    *
    * Shape: unlike linear()'s two range windows, positions need each
    * conversion to SEE its window's touch ORDER, so the plan is ONE
    * user-keyed interval equi-join (touches⋈conversions on user, range
    * post-filter) + a per-conversion rank window. Both sides shuffle
    * once on the user key; per-conversion fanout is bounded by the
    * lookback horizon, never corpus-wide, and the rank window partitions
    * by (user, conversion) — already-bounded groups.
    *
    * Determinism: integer-cents rules with truncating division — first
    * = last = (v*2) div 5 for n≥3, middles share v − 2·((v*2) div 5)
    * by div (n−2); truncation dust stays unattributed (same convention
    * as linear()). Touch order ties break on event id.
    */
  def positional(
      events: DataFrame,
      touchTypes: Seq[String],
      convType: String,
      lookbackNs: Long,
      valueCents: Column,
      userCol: String = "user_id",
      tsCol: String = "ts_ns",
      idCol: String = "event_id"): DataFrame = {
    require(lookbackNs > 0, "lookback must be positive")
    val touches = events.where(col("event_type").isin(touchTypes: _*))
      .select(col(userCol), col(tsCol).as("touch_ts"), col(idCol).as("touch_id"),
        col("event_type").as("touch_type"))
    val convs = events.where(col("event_type") === convType)
      .select(col(userCol), col(tsCol).as("conv_ts"), col(idCol).as("conv_id"),
        valueCents.as("conv_cents"))
    val joined = touches.join(convs, Seq(userCol))
      .where(col("touch_ts") >= col("conv_ts") - lookbackNs &&
        col("touch_ts") <= col("conv_ts"))
    val byConv = Window.partitionBy(col(userCol), col("conv_id"))
    val ordered = byConv.orderBy(col("touch_ts"), col("touch_id"))
    joined
      .withColumn("rnk", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(byConv))
      .withColumn("position",
        when(col("rnk") === 1, lit("first"))
          .when(col("rnk") === col("n"), lit("last"))
          .otherwise(lit("middle")))
      .withColumn("credit_cents",
        when(col("n") === 1, col("conv_cents"))
          .when(col("n") === 2,
            when(col("rnk") === 1, expr("conv_cents div 2"))
              .otherwise(col("conv_cents") - expr("conv_cents div 2")))
          .when(col("rnk") === 1 || col("rnk") === col("n"),
            expr("(conv_cents * 2) div 5"))
          .otherwise(
            expr("(conv_cents - 2 * ((conv_cents * 2) div 5)) div (n - 2)")))
      .select(col(userCol), col("touch_ts"), col("touch_type"),
        col("position"), col("credit_cents"))
  }

  /** Time-decay attribution: a touch's weight halves for every
    * `halflifeNs` of age at conversion time — recent touches dominate,
    * stale ones fade, the recency curve between linear()'s flat split
    * and last-touch's winner-take-all. Weights are EXACT integers:
    * w = 1000 >> min(age div halflife, 9) (permille halving steps,
    * floored at 1 so an in-window touch never zeroes out and the
    * per-conversion weight sum stays positive); each touch's credit is
    * conv_cents·w div Σw over the conversion's window — truncation dust
    * unattributed, the house convention.
    *
    * Same single user-keyed interval join as positional(); the weight
    * sum is one more window over the same (user, conversion) partition,
    * so no extra shuffle.
    */
  def timeDecay(
      events: DataFrame,
      touchTypes: Seq[String],
      convType: String,
      lookbackNs: Long,
      halflifeNs: Long,
      valueCents: Column,
      userCol: String = "user_id",
      tsCol: String = "ts_ns",
      idCol: String = "event_id"): DataFrame = {
    require(lookbackNs > 0 && halflifeNs > 0, "horizons must be positive")
    val touches = events.where(col("event_type").isin(touchTypes: _*))
      .select(col(userCol), col(tsCol).as("touch_ts"), col(idCol).as("touch_id"),
        col("event_type").as("touch_type"))
    val convs = events.where(col("event_type") === convType)
      .select(col(userCol), col(tsCol).as("conv_ts"), col(idCol).as("conv_id"),
        valueCents.as("conv_cents"))
    val byConv = Window.partitionBy(col(userCol), col("conv_id"))
    touches.join(convs, Seq(userCol))
      .where(col("touch_ts") >= col("conv_ts") - lookbackNs &&
        col("touch_ts") <= col("conv_ts"))
      .withColumn("k",
        least(expr(s"(conv_ts - touch_ts) div $halflifeNs"), lit(9L)))
      .withColumn("w", expr("greatest(1000 div shiftleft(1, cast(k as int)), 1)"))
      .withColumn("sw", sum("w").over(byConv))
      .withColumn("credit_cents", expr("(conv_cents * w) div sw"))
      .select(col(userCol), col("touch_ts"), col("touch_type"), col("k"),
        col("credit_cents"))
  }
}
