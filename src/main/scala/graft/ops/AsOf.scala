package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key.
  *
  * NOT implemented as a range join (which explodes to a pairwise
  * comparison per key) but as the union+window trick: tag both sides,
  * sort once per key by (ts, side), and carry the last-seen right-side
  * payload forward with `last(..., ignoreNulls)`. One shuffle on the
  * key, linear work, no pairwise blowup — the 100 TB-safe as-of shape.
  */
object AsOf {

  /** `payload` = right-side columns to carry (aliased `asof_<name>`).
    * Left rows with no prior right row get nulls. Ties on ts resolve
    * right-before-left (a right row AT the same ts matches).
    */
  def joinLastPrior(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("__side", lit(1))
    val rTagged = right.withColumn("__side", lit(0))
    val leftCols = left.columns
    val all = lTagged.columns.toSet ++ rTagged.columns.toSet
    def align(df: DataFrame): DataFrame = {
      val cols = all.toSeq.sorted.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c))
      df.select(cols: _*)
    }
    val unioned = align(lTagged).unionByName(align(rTagged))
    // right rows sort before left rows at equal ts => "<=" semantics
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { case (df, p) =>
      df.withColumn(
        s"asof_$p",
        last(when(col("__side") === 0, col(p)), ignoreNulls = true).over(w))
    }
    carried
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(p => col(s"asof_$p"))).toIndexedSeq: _*)
  }
}
