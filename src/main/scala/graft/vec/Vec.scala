package graft.vec

import graft.functions.Mix64
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector ops over `array<float>` embedding columns.
  *
  * Built on higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDFs, map-side only, so they compose with scans and pushdown.
  *
  * For oracle-checked cosine, vectors are first quantized to integer
  * milli-units: all dot products and norms are then exact 64-bit integer
  * arithmetic, so Spark and DuckDB agree bit-for-bit regardless of
  * float-summation order; the single final `int / sqrt(int)` division is
  * deterministic on both engines.
  */
object Vec {

  /** Quantize a float vector to `round(x * scale)` longs. */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => round(x.cast("double") * scale).cast("long"))

  /** Integer dot product of two quantized vectors. Fused one-pass kernel
    * (r14 optimization: the compositional
    * `aggregate(zip_with(a, b, _*_), 0L, _+_)` walked both arrays and
    * allocated an intermediate product array per call); bit-identical —
    * exact wraparound 64-bit sums in the same element order, same null
    * semantics — pinned by R14OptSpec against the compositional form.
    */
  def dotQ(a: Column, b: Column): Column = graft.functions.vexprs.dot_q(a, b)

  /** Exact cosine over quantized vectors (deterministic double). Fused
    * one-pass kernel (r14): the compositional form paid three
    * aggregate(zip_with(...)) dots = five array walks + three intermediate
    * arrays per PAIR — the hot inner loop of every pairwise truth leg and
    * broadcast scan. Bit-identical (same integer sums, same single
    * double division, same null contract), pinned by R14OptSpec.
    */
  def cosineQ(a: Column, b: Column): Column = graft.functions.vexprs.cosine_q(a, b)

  /** Float-native dot (for in-engine paths with no oracle). */
  def dotF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosineF(a: Column, b: Column): Column = {
    val n2 = dotF(a, a) * dotF(b, b)
    when(n2 === 0.0, lit(0.0)).otherwise(dotF(a, b) / sqrt(n2))
  }

  /** Int8 quantization of the L2-normalized vector: each component maps
    * to round(127 * q_i / ||q||) over the exact milli-unit quantized
    * vector, so both the norm (integer dot) and the single per-component
    * double division are deterministic cross-engine. The standard storage
    * shrink for ANN at scale: 4 bytes/dim float -> 1 byte/dim.
    *
    * The quantized array and its norm are bound ONCE per row via the
    * single-element-struct let-binding — referencing them directly inside
    * the per-component lambda would recompute the quantization (and the
    * O(d) norm!) for every component.
    */
  def int8Normalize(v: Column): Column = {
    val q = quantize(v)
    element_at(
      transform(
        array(struct(q.as("q"), dotQ(q, q).as("n"))),
        s =>
          transform(
            s.getField("q"),
            x =>
              when(s.getField("n") === 0L, lit(0L))
                .otherwise(
                  round(x.cast("double") * 127.0 / sqrt(s.getField("n").cast("double")))
                    .cast("long")))),
      1)
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: `planes(p, d)`
    * gives p rows of d components in [-1, 1), derived from Mix64(seed).
    */
  def hyperplanes(p: Int, d: Int, seed: Long = 7L): Seq[Seq[Double]] =
    Seq.tabulate(p)(j =>
      Seq.tabulate(d)(i => Mix64(seed + j.toLong * d + i).toDouble / Long.MaxValue.toDouble))

  /** Sign-LSH bucket id: bit j set iff dot(v, plane_j) > 0.
    * All p dots in one imperative pass (PlaneDots expression); the bit
    * assembly over the tiny dots array is a cheap zip with power-of-two
    * literals. The scale path for ANN: bucket the corpus once
    * (amortizable at write time), probe per bucket.
    */
  def lshBucket(v: Column, p: Int = 8, d: Int = 64, seed: Long = 7L): Column = {
    val dots = graft.functions.exprs.plane_dots(v, hyperplanes(p, d, seed))
    val powers = typedLit(Seq.tabulate(p)(j => 1L << j))
    aggregate(
      zip_with(dots, powers, (dt, pw) => when(dt > 0.0, pw).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }
}
