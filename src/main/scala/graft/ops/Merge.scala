package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style upsert — beyond the reference's TRUNCATE-and-reload
  * refresh: rows from `updates` replace target rows with the same key,
  * unmatched target rows pass through, unmatched update rows insert.
  *
  * One full-outer shuffle join on the key; no driver-side diffing. At
  * 100 TB pair with bucketed storage on the key (sinks.Bucketed) and the
  * join plans exchange-free.
  */
object Merge {

  /** Semantics (probed, not just intended):
    *  - `updates` must be unique on `key`: duplicate update keys produce
    *    duplicate output rows (SQL MERGE would raise; dedup upstream with
    *    e.g. Dedup.exact or a window if the source can repeat).
    *  - a NULL in an update column means "keep the target value"
    *    (coalesce semantics), not "set to NULL".
    */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val others = target.columns.filterNot(_ == key)
    val renamed = others.foldLeft(updates) { (df, c) => df.withColumnRenamed(c, s"__u_$c") }
    target
      .join(renamed, Seq(key), "full_outer")
      .select(
        (col(key) +: others.map(c => coalesce(col(s"__u_$c"), col(c)).as(c))).toIndexedSeq: _*)
  }

  /** CDC changelog apply: collapse an op-sequenced changelog to final
    * table state. Per key the row with the HIGHEST `seqCol` wins; if the
    * winning op is `deleteOp`, the key is gone from the output.
    *
    * `seqCol` must be unique per key (a changelog LSN / commit sequence
    * is). Windowless winner selection: min(struct(-seq, op, payload))
    * partial-aggregates map-side, so a key updated millions of times —
    * the classic CDC hot row — never concentrates on one reducer the
    * way a row_number window would.
    */
  def cdcApply(
      changelog: DataFrame,
      key: String,
      seqCol: String,
      opCol: String,
      payload: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    val fields = (-col(seqCol)).as("ns") +: col(opCol).as("op") +: payload.map(col)
    changelog
      .groupBy(key)
      .agg(min(struct(fields: _*)).as("w"))
      .where(col("w.op") =!= deleteOp)
      .select(
        (col(key) +: (-col("w.ns")).as(seqCol) +: payload.map(c => col(s"w.$c").as(c))): _*)
  }

  /** Point-in-time lookup against an SCD2 dimension (the read half of
    * [[scd2]]): each fact row joins the dimension version whose
    * `[valid_from, valid_to)` interval contains the fact's `asOfCol`
    * (`valid_to IS NULL` = open row). Facts with no covering version
    * pass through with NULL dimension columns (left join).
    *
    * Scale shape: ONE equi-join shuffle on the key — the validity
    * interval is a residual predicate on the equi-join, NOT a range-join
    * problem, because key equality already carries the match; versions
    * per key are few, so the residual filters a handful of rows per
    * probe. Never plans a nested-loop join.
    */
  def pointInTime(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      asOfCol: String): DataFrame =
    fact.join(
      dim,
      col(factKey) === col(dimKey) &&
        col(asOfCol) >= col("valid_from") &&
        (col("valid_to").isNull || col(asOfCol) < col("valid_to")),
      "left")

  /** SCD Type-2 merge: effective-dated dimension history.
    *
    * `target` columns: `key`, `attrs...`, `valid_from` (long),
    * `valid_to` (long, NULL = open row). `updates` columns: `key`,
    * `attrs...`, `effectiveCol` (long), unique per key. Output is the
    * new dimension state:
    *  - closed history passes through untouched,
    *  - open rows whose update carries identical attrs pass through
    *    (idempotent loads don't churn versions),
    *  - open rows with a changed update are CLOSED at the effective date,
    *  - changed and brand-new keys get a fresh open row dated at the
    *    effective date.
    *
    * Scale shape: ONE full-outer shuffle join of open rows vs updates on
    * the key; closed history is a pass-through union (no shuffle).
    * Attr comparison is null-safe (`<=>`).
    */
  def scd2(
      target: DataFrame,
      updates: DataFrame,
      key: String,
      attrs: Seq[String],
      effectiveCol: String = "effective"): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute column")
    val closedHist = target.where(col("valid_to").isNotNull)
    val open = target.where(col("valid_to").isNull)
    val renamed = updates.columns.filterNot(_ == key).foldLeft(updates) {
      (df, c) => df.withColumnRenamed(c, s"__u_$c")
    }
    val j = open.join(renamed, Seq(key), "full_outer")
    val hasT = col("valid_from").isNotNull
    val hasU = col(s"__u_$effectiveCol").isNotNull
    val same = attrs.map(a => col(a) <=> col(s"__u_$a")).reduce(_ && _)
    val tCols = (col(key) +: attrs.map(col)) :+ col("valid_from")
    val uCols = (col(key) +: attrs.map(a => col(s"__u_$a").as(a))) :+
      col(s"__u_$effectiveCol").as("valid_from")
    val untouchedOpen = j.where(hasT && (!hasU || same))
      .select(tCols :+ lit(null).cast("long").as("valid_to"): _*)
    val closedNow = j.where(hasT && hasU && !same)
      .select(tCols :+ col(s"__u_$effectiveCol").as("valid_to"): _*)
    val freshOpen = j.where(hasU && (!hasT || !same))
      .select(uCols :+ lit(null).cast("long").as("valid_to"): _*)
    closedHist.select(untouchedOpen.columns.map(col).toIndexedSeq: _*)
      .unionByName(untouchedOpen)
      .unionByName(closedNow)
      .unionByName(freshOpen)
  }
}
