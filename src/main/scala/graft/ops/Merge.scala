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
}
