package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min-sketch frequency estimation — the heavy-hitter counterpart
  * to the HLL approximate-distinct path (ops.Profile): a fixed-size
  * sketch aggregated distributed (map-side partials, one tiny merge),
  * then point estimates served driver-side from the merged sketch.
  * Estimates never under-count and over-count by at most eps * N with
  * the configured confidence — the classic CMS guarantee, spec-checked.
  */
object Freq {

  /** Merged sketch bytes for `c` over `df` (deterministic given seed). */
  def sketch(df: DataFrame, c: Column, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): Array[Byte] =
    df.select(count_min_sketch(c, lit(eps), lit(confidence), lit(seed)).as("s"))
      .head().getAs[Array[Byte]](0)

  /** Point estimates for `probes` from one distributed sketch pass. */
  def estimates(
      df: DataFrame,
      c: Column,
      probes: Seq[Any],
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): Map[Any, Long] = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch(df, c, eps, confidence, seed)))
    probes.map(p => p -> cms.estimateCount(p)).toMap
  }
}
