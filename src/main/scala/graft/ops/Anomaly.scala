package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust anomaly thresholds per group: exact MEDIAN and MAD (median
  * absolute deviation) computed from integer-valued histograms — the
  * outlier gate a metrics pipeline runs before alerting or data gets
  * dropped.
  *
  * Scale shape: Spark's exact `percentile` aggregate buffers every
  * group's values; a hot group (one event_type = half the corpus) blows
  * its buffer. This operator never holds raw values: it aggregates to
  * (group, value) COUNTS first — one map-side-combinable shuffle whose
  * reduce state is bounded by the value DOMAIN, not the row count —
  * then walks each group's histogram with a cumulative window whose
  * partition size is again domain-bounded. A second identical pass over
  * |x − median| yields the MAD. Two aggregate+window rounds total,
  * independent of group skew.
  *
  * Median convention: lower median (the smallest value whose cumulative
  * count reaches ceil(n/2)) — integer-exact, no interpolation, so the
  * SQL oracle reproduces it bit-for-bit on BIGINT inputs.
  *
  * Cardinality contract: the histogram-walk window partition holds one
  * row per DISTINCT value per group, so state is bounded by the value
  * domain, not the row count. For naturally discrete domains (integer
  * cents, counts, micros) that bound is the contract as-is. For
  * continuous or unbounded-cardinality metrics, pass `binWidth` > 1:
  * values are floor-binned to multiples of binWidth BEFORE the
  * histogram, capping every window partition at (domain span /
  * binWidth) + 1 rows per group; median and MAD are then exact over the
  * binned values (within binWidth of the unbinned statistics).
  * AnomalyBinSpec plants a ~1e6-distinct-value group and asserts the
  * bound.
  */
object Anomaly {

  /** `rows(group, v: long)` → one row per group:
    * (group, n, med, mad, n_outliers) where outliers are
    * |v − med| · 1000 > devX1000 · max(mad, 1).
    * `binWidth` = 1 (default) is exact on integer domains; > 1 pre-bins
    * (floor to multiples) to bound histogram cardinality — see the
    * class doc's cardinality contract.
    */
  def madThresholds(rows: DataFrame, groupCol: String, vCol: String, devX1000: Long,
                    binWidth: Long = 1L): DataFrame = {
    require(binWidth >= 1L, s"binWidth must be >= 1, got $binWidth")
    val g = col(groupCol)
    // floor-bin (toward -inf, exact for negatives): v - ((v % bw + bw) % bw)
    val binned =
      if (binWidth == 1L) rows
      else {
        val bw = lit(binWidth)
        rows.withColumn(vCol,
          (col(vCol) - ((col(vCol) % bw + bw) % bw)).cast("long"))
      }

    val med = lowerMedian(g, binned, vCol, "med")
    val dev = binned.join(med, groupCol)
      .select(g, abs(col(vCol) - col("med")).as("d"))
    val mad = lowerMedian(g, dev, "d", "mad")
    val flagged = binned
      .join(med, groupCol).join(mad, groupCol)
      .select(g, col(vCol).as("v"), col("med"), col("mad"), col("med_n").as("n"))
      .withColumn("is_out",
        abs(col("v") - col("med")) * 1000 > lit(devX1000) * greatest(col("mad"), lit(1L)))
    flagged
      .groupBy(g, col("n"), col("med"), col("mad"))
      .agg(sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
      .select(g, col("n"), col("med"), col("mad"), col("n_outliers"))
  }

  /** Per-ROW outlier flags under the same robust thresholds: the input
    * frame comes back with `med`, `mad`, and `is_out` appended (every
    * original column preserved — callers keep their time buckets / ids).
    * Same two-histogram-pass shape and the same cardinality contract as
    * [[madThresholds]]; with `binWidth` > 1 the flag is computed on the
    * binned value while the reported `vCol` stays raw.
    */
  def flagOutliers(rows: DataFrame, groupCol: String, vCol: String, devX1000: Long,
                   binWidth: Long = 1L): DataFrame = {
    require(binWidth >= 1L, s"binWidth must be >= 1, got $binWidth")
    val g = col(groupCol)
    val bv = "__graft_binned_v"
    require(!rows.columns.contains(bv), s"input already has a $bv column")
    val binned =
      if (binWidth == 1L) rows.withColumn(bv, col(vCol).cast("long"))
      else {
        val bw = lit(binWidth)
        rows.withColumn(bv,
          (col(vCol) - ((col(vCol) % bw + bw) % bw)).cast("long"))
      }
    val med = lowerMedian(g, binned, bv, "med").drop("med_n")
    val dev = binned.join(med, groupCol)
      .select(g, abs(col(bv) - col("med")).as("d"))
    val mad = lowerMedian(g, dev, "d", "mad").drop("mad_n")
    binned
      .join(med, groupCol).join(mad, groupCol)
      .withColumn("is_out",
        abs(col(bv) - col("med")) * 1000 > lit(devX1000) * greatest(col("mad"), lit(1L)))
      .drop(bv)
  }

  /** Lower median per group from a (group, value) histogram: the
    * smallest value whose cumulative count reaches ceil(n/2). Window
    * partitions are bounded by the value DOMAIN (see the class doc's
    * cardinality contract). Public: also the median kernel for
    * inter-arrival statistics (SparkEntry q_events_interarrival).
    */
  def lowerMedian(
      g: org.apache.spark.sql.Column,
      frame: DataFrame,
      valueCol: String,
      outName: String): DataFrame = {
    val counts = frame.groupBy(g, col(valueCol).as("hv")).agg(count(lit(1)).as("c"))
    val byValue = Window.partitionBy(g).orderBy(col("hv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byGroup = Window.partitionBy(g)
    counts
      .withColumn("cum", sum(col("c")).over(byValue))
      .withColumn("n", sum(col("c")).over(byGroup))
      .where(col("cum") * 2 >= col("n")) // first value reaching ceil(n/2)
      .groupBy(g).agg(min(col("hv")).as(outName), min(col("n")).as(s"${outName}_n"))
  }
}
