package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded interval join: pair each left row with the right rows whose
  * timestamp falls in [leftTs + lowerDelta, leftTs + upperDelta], equi-
  * matched on `keys`.
  *
  * Naive formulations plan as BroadcastNestedLoopJoin (quadratic, driver-
  * killing at scale). This operator uses the standard bucketization
  * rewrite: both sides get an integer bucket of width (upperDelta -
  * lowerDelta + 1); the left side can overlap at most TWO buckets, so it
  * explodes to <= 2 rows and the join becomes a plain hash equi-join on
  * (keys, bucket) with a residual BETWEEN filter — ONE shuffle, linear
  * work, AQE-skew-handled like any other equi-join.
  */
object RangeJoin {

  /** Inner interval join. `left`/`right` must have disjoint column names
    * apart from `keys`; `leftTs`/`rightTs` are long (e.g. epoch ns)
    * columns. Deltas are inclusive bounds relative to the left timestamp.
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      lowerDelta: Long,
      upperDelta: Long): DataFrame = {
    require(upperDelta >= lowerDelta, "upperDelta must be >= lowerDelta")
    val width = upperDelta - lowerDelta + 1
    val l = left.withColumn(
      "__bucket",
      explode(array_distinct(array(
        expr(s"($leftTs + $lowerDelta) div $width"),
        expr(s"($leftTs + $upperDelta) div $width")))))
    val r = right.withColumn("__bucket", expr(s"$rightTs div $width"))
    l.join(r, keys :+ "__bucket")
      .where(col(rightTs) >= col(leftTs) + lowerDelta &&
        col(rightTs) <= col(leftTs) + upperDelta)
      .drop("__bucket")
  }
}
