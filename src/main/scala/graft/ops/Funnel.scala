package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered N-stage funnel: for each key, stage i is reached at the
  * FIRST event of stage i's type that strictly follows the time stage
  * i-1 was reached. Keys that never reach stage 1 are absent.
  *
  * Shape at scale: each stage is a filtered aggregate keyed on `key`,
  * chained by an equi-join also on `key` — Spark plans every exchange
  * on the same key, so the chain reuses one partitioning and each
  * stage's join input shrinks monotonically (stage i's frame only
  * contains keys that survived stage i-1). No windows, no skew hazard:
  * a key with millions of events partial-aggregates map-side first.
  */
object Funnel {

  /** Returns one row per key that reached stage 1:
    * (key, t1..tN nullable, stage = highest stage reached).
    *
    * `maxGap` (same unit as `tsCol`) bounds each stage transition: when
    * set, stage i+1 must land in (t_i, t_i + maxGap] — the "purchase
    * within 7 days of the view" conversion-window semantics, where a
    * reactivation months later is a NEW journey, not a conversion. The
    * bound rides the stage filter as one more residual predicate; plan
    * shape (chained filtered aggregates, one reused key partitioning,
    * no windows) is unchanged.
    */
  def ordered(
      events: DataFrame,
      key: String,
      typeCol: Column,
      tsCol: Column,
      stages: Seq[String],
      maxGap: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events.select(col(key), typeCol.as("__type"), tsCol.as("__ts"))
    val first = e.where(col("__type") === stages.head)
      .groupBy(key).agg(min("__ts").as("t1"))
    val chain = stages.zipWithIndex.tail.scanLeft(first) {
      case (prev, (stage, i)) =>
        val within = maxGap
          .map(g => col("__ts") > col(s"t$i") && col("__ts") <= col(s"t$i") + g)
          .getOrElse(col("__ts") > col(s"t$i"))
        e.where(col("__type") === stage).join(prev.select(key, s"t$i"), key)
          .where(within)
          .groupBy(key).agg(min("__ts").as(s"t${i + 1}"))
    }
    val joined = chain.tail.foldLeft(chain.head) {
      (acc, s) => acc.join(s, Seq(key), "left")
    }
    val stageCol = stages.indices.tail
      .map(i => col(s"t${i + 1}").isNotNull.cast("long"))
      .foldLeft(lit(1L))(_ + _)
    joined.select(
      (col(key) +: stages.indices.map(i => col(s"t${i + 1}"))) :+ stageCol.as("stage"): _*)
  }
}
