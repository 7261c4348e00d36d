package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase aggregation.
  *
  * When a groupBy key is heavily skewed (few distinct values, or a hot
  * key holding most rows), the single shuffle sends each hot key to one
  * reducer. Salting splits each key into `saltBuckets` sub-keys for a
  * partial aggregate, then a cheap second aggregate over the (tiny)
  * partial results removes the salt. Map-side partial aggregation plus
  * the salt bound the per-reducer load at (rows/key)/saltBuckets.
  *
  * Sum/count/min/max are algebraic, so the two-phase result is exactly
  * the single-phase result — the oracle-checked query q_salted_agg
  * proves it against plain SQL GROUP BY.
  */
object Salt {

  /** Deterministic row salt in [0, buckets). Derives from a uniquifying
    * column when available (stable across runs); spark_partition_id is
    * NOT used because AQE may change partition layout between runs.
    */
  def saltCol(uniqueCol: Column, buckets: Int): Column =
    pmod(xxhash64(uniqueCol), lit(buckets.toLong))

  /** Skew-resistant inner equi-join. A plain shuffle join sends every
    * row of a hot key to ONE reducer; here the fact side keeps its rows
    * where they land under a deterministic per-row salt, and the dim
    * side is replicated `buckets` times (explode over the salt range),
    * so the join key (keys :+ salt) spreads a hot key over `buckets`
    * reducers. Cost: dim shuffle bytes × buckets — use when the dim is
    * far smaller than the fact but too big (or too skew-prone) to
    * broadcast outright. Row-identical to the plain join (oracle-checked
    * by q_salted_join); AQE's skew-join handles moderate skew at runtime,
    * this handles the pathological key that exceeds a single executor.
    */
  def joinSkewed(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      uniqueCol: Column,
      buckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(uniqueCol, buckets))
    val repDim = dim.withColumn(
      "__salt", explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    saltedFact.join(repDim, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase SUM/COUNT aggregate: `sums` maps output name -> column to
    * sum. Returns one row per key with exact sums and row count.
    */
  def sumsSkewed(
      df: DataFrame,
      keys: Seq[String],
      uniqueCol: Column,
      sums: Seq[(String, Column)],
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(uniqueCol, buckets))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        count(lit(1)).as("__n"),
        sums.map { case (name, c) => sum(c).as(s"__p_$name") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__n")).as("n_rows"),
        sums.map { case (name, _) => sum(col(s"__p_$name")).as(name) }: _*)
  }
}
