package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-prefiltered shuffle join — the explicit form of Spark's
  * runtime row-level filtering, for when the build side is too big to
  * broadcast but far smaller than the probe side.
  *
  * `prefilterInner(fact, dim, ...)` builds a bloom filter over the dim
  * join keys with ONE distributed aggregate (Spark's own
  * BloomFilterAggregate over xxhash64(key) — the exact kernel
  * InjectRuntimeFilter plants), ships the compact sketch back as a
  * literal (driver holds only the bloom bytes — index metadata, like a
  * k-means codebook, never data), and filters the fact MAP-SIDE before
  * the join shuffle.
  *
  * Scale contract: at 100 TB the join's shuffle write is the dominant
  * cost; a bloom with fpp=1% cuts it to (selectivity + 1%) of the fact
  * — for a 1%-selective dim that is a ~50× shuffle-byte reduction for
  * the price of one dim-sized aggregate. The final equi-join still
  * verifies every candidate, so false positives cost shuffle bytes,
  * never wrong rows: the result is row-identical to the plain join,
  * which is exactly what the oracle hash-checks.
  */
object BloomJoin {

  /** Bloom bytes for `df`'s `key` column (long-hashable), built
    * distributed, collected as index metadata. None on an empty frame.
    */
  def keyBloom(df: DataFrame, key: String, expectedKeys: Long, fpp: Double): Option[Array[Byte]] = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1, s"bad bloom shape: $expectedKeys/$fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedKeys, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(col(key)))), Literal(expectedKeys), Literal(numBits))
    val bytes = df
      .select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    Option(bytes)
  }

  /** might_contain(bloom, xxhash64(key)) as a Column — codegen'd, map-side. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(Literal(bloom), new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Inner equi-join with the fact side bloom-prefiltered map-side.
    * Row-identical to `fact.join(dim, fact(factKey) === dim(dimKey))`.
    */
  def prefilterInner(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedKeys: Long = 1 << 20,
      fpp: Double = 0.01): DataFrame = {
    val pre = keyBloom(dim, dimKey, expectedKeys, fpp) match {
      case Some(b) => fact.where(mightContain(b, col(factKey)))
      case None    => fact.where(lit(false)) // empty dim: inner join is empty
    }
    pre.join(dim, col(factKey) === col(dimKey))
  }
}
