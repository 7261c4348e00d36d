package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap (Chamandy, Najmi, Shekholeslami & Wilson,
  * "Estimating uncertainty for massive data streams", Google 2012).
  *
  * The classical bootstrap resamples n rows WITH replacement B times —
  * B full shuffles of the corpus, untenable at scale. The Poisson
  * approximation observes that each row's multiplicity in one resample
  * is Binomial(n, 1/n) → Poisson(1), independent per row, so every
  * replicate reduces to a per-row weight drawn at map time: ALL B
  * replicate sums fall out of ONE corpus pass with map-side partial
  * aggregation into B running (Σw, Σw·x) cells. This is the only
  * bootstrap shape that survives 100 TB — per-task state is B
  * accumulators, the shuffle carries B rows per partition.
  *
  * Weights are deterministic: SplitMix64(key·B + b) top-32 bits
  * compared against floor(CDF_Pois(1)(k)·2^32) INTEGER thresholds, the
  * identical literals on both engines, so every replicate sum is
  * bit-exact cross-engine (no float RNG, no order dependence).
  */
object Bootstrap {

  /** floor(CDF_Poisson(1)(k) · 2^32) for k = 0..7; a uniform u below
    * threshold k (first match) has weight k, the ≈1e-5 upper tail is
    * capped at 8 (bias < 4e-5 events per million rows, identical on
    * both engines by construction).
    */
  val CdfQ32: Array[Long] = Array(
    1580030168L, 3160060337L, 3950075421L, 4213413783L,
    4279248373L, 4292415291L, 4294609777L, 4294923276L)

  /** Inverse-CDF Poisson(1) weight from a top-32-bit uniform. */
  def poissonWeight(u: Column): Column =
    CdfQ32.zipWithIndex.foldRight(lit(8L): Column) { case ((t, k), els) =>
      when(u < lit(t), lit(k.toLong)).otherwise(els)
    }

  /** Bootstrap distribution of the mean of `value` (integer units) with
    * a 95% percentile CI: B replicate rows (n_w, tot, truncated-division
    * mean in milli-units) plus the interpolated 2.5/97.5 percentile
    * bounds of the replicate means. The CI window runs over the B-row
    * replicate frame — bounded by the replicate count, never the corpus.
    */
  def meanCI(
      rows: DataFrame,
      key: Column,
      value: Column,
      b: Int = 32): DataFrame = {
    require(b >= 2, s"meanCI: need b >= 2 replicates, got $b")
    val mixed = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Mix64Long(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          col("k") * lit(b.toLong) + col("replicate"))))
    val u = shiftrightunsigned(mixed, 32)
    val perRep = rows
      .select(key.as("k"), value.as("v"))
      .select(col("k"), col("v"),
        explode(typedLit((0 until b).map(_.toLong))).as("replicate"))
      .withColumn("w", poissonWeight(u))
      .groupBy("replicate")
      .agg(
        sum(col("w")).as("n_w"),
        sum(col("w") * col("v")).as("tot"))
      .withColumn("mean_milli",
        when(col("n_w") === 0L, lit(0L))
          .otherwise(expr("tot * 1000 div n_w")))
    val all = Window.partitionBy() // B-row frame: bounded by b
    perRep
      .withColumn("ci_lo_milli",
        percentile(col("mean_milli"), lit(0.025)).over(all))
      .withColumn("ci_hi_milli",
        percentile(col("mean_milli"), lit(0.975)).over(all))
  }
}
