package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

import graft.functions.Mix64Long

/** Deterministic discrete-Laplace noise (the geometric mechanism of
  * Ghosh–Roughgarden–Sundararajan) by inverse-CDF table sampling of a
  * SplitMix64 uniform: P(k) ∝ exp(−|k|/2) on k ∈ [−12, 12] (ε = 0.5 for
  * a sensitivity-1 count, up to the documented tail truncation), CDF
  * thresholds precomputed offline on a 2²⁰ grid and inlined as integer
  * literals in BOTH engines. Determinism is the point: a re-run (or the
  * SQL oracle) reproduces the protected release bit-for-bit instead of
  * burning privacy budget per retry. The draw is 25 integer threshold
  * compares riding whole-stage codegen.
  */
object DpNoise {

  /** Cumulative thresholds of the discrete Laplace (b=2) on [−12, 12]
    * over a 2^20 grid; noise = |{t : t ≤ v}| − 12.
    */
  val cdf20: Seq[Long] = Seq(
    638L, 1689L, 3423L, 6281L, 10994L, 18764L, 31574L, 52694L, 87515L,
    144926L, 239581L, 395639L, 652937L, 808995L, 903650L, 961061L,
    995882L, 1017002L, 1029812L, 1037582L, 1042295L, 1045153L, 1046887L,
    1047938L, 1048576L)

  /** Noise term for an integer stream key (distinct keys = independent
    * draws): top-20 Mix64 bits → table bucket → k ∈ [−12, 12].
    */
  def noise(key: Column): Column = {
    val v = (shiftrightunsigned(column(Mix64Long(expression(key))), 32) / 4096L)
      .cast("long")
    size(filter(typedLit(cdf20), t => t <= v)).cast("long") - 12L
  }
}
