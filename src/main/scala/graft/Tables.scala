package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-checked loaders for the test star schema.
  *
  * Every loader is a plain parquet scan — projections and filters applied
  * downstream reach the scan via Catalyst pushdown, so callers should NOT
  * cache or materialize here.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark's
    * TimestampType (µs) cannot represent; read nanos as long
    * (legacy.parquet.nanosAsLong) and expose both the raw `ts_ns` and a
    * µs-truncated `ts` TimestampType column.
    *
    * NOTE deliberate session-level setting: Spark has no per-read option
    * for nanosAsLong (ParquetOptions exposes only compression/rebase/
    * mergeSchema), so this cannot be scoped to one scan. GraftSession sets
    * it at build time; setting it here too keeps driver-built sessions
    * (Verify/Bench contract) working. Effect on other reads: parquet
    * TIMESTAMP(NANOS) columns — which µs-based Spark would otherwise
    * reject outright — surface as LongType everywhere in the session.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000"))) // integer div: double division loses precision at 1e18 ns
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
