package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-checked loaders for the test star schema.
  *
  * Every loader is a plain parquet scan — projections and filters applied
  * downstream reach the scan via Catalyst pushdown, so callers should NOT
  * cache or materialize here.
  *
  * Loads validate the scanned schema against the expected column set and
  * accepted types BEFORE any query runs, so driver-side testdata
  * regeneration that drifts a dtype fails with one clear message naming
  * the table/column/found/wanted — not a mid-query DATATYPE_MISMATCH
  * twenty operators downstream (which is exactly what happened when the
  * events `ts` column silently changed from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) between rounds).
  */
object Tables {

  private type TypeOk = DataType => Boolean
  private val intLike: TypeOk = { case IntegerType | LongType => true; case _ => false }
  private val dblLike: TypeOk = { case DoubleType | FloatType => true; case _ => false }
  private val strLike: TypeOk = _ == StringType
  private val timeLike: TypeOk = {
    // LongType covers TIMESTAMP(NANOS) surfaced via legacy.parquet.nanosAsLong
    case TimestampType | TimestampNTZType | DateType | LongType => true
    case _ => false
  }
  private val floatVec: TypeOk = {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Required columns (name, accepted-type predicate, human-readable want)
    * per table. Extra columns are tolerated; missing or wrong-typed ones
    * fail the load.
    */
  private val expected: Map[String, Seq[(String, TypeOk, String)]] = Map(
    "region" -> Seq(
      ("r_regionkey", intLike, "int"), ("r_name", strLike, "string")),
    "nation" -> Seq(
      ("n_nationkey", intLike, "int"), ("n_name", strLike, "string"),
      ("n_regionkey", intLike, "int")),
    "customer" -> Seq(
      ("c_custkey", intLike, "int"), ("c_name", strLike, "string"),
      ("c_nationkey", intLike, "int"), ("c_acctbal", dblLike, "double"),
      ("c_mktsegment", strLike, "string")),
    "supplier" -> Seq(
      ("s_suppkey", intLike, "int"), ("s_name", strLike, "string"),
      ("s_nationkey", intLike, "int"), ("s_acctbal", dblLike, "double")),
    "part" -> Seq(
      ("p_partkey", intLike, "int"), ("p_name", strLike, "string"),
      ("p_brand", strLike, "string"), ("p_type", strLike, "string"),
      ("p_size", intLike, "int"), ("p_retailprice", dblLike, "double")),
    "orders" -> Seq(
      ("o_orderkey", intLike, "int"), ("o_custkey", intLike, "int"),
      ("o_orderstatus", strLike, "string"), ("o_totalprice", dblLike, "double"),
      ("o_orderdate", timeLike, "timestamp/date"),
      ("o_orderpriority", strLike, "string")),
    "lineitem" -> Seq(
      ("l_orderkey", intLike, "int"), ("l_partkey", intLike, "int"),
      ("l_suppkey", intLike, "int"), ("l_linenumber", intLike, "int"),
      ("l_quantity", dblLike, "double"), ("l_extendedprice", dblLike, "double"),
      ("l_discount", dblLike, "double"), ("l_tax", dblLike, "double"),
      ("l_returnflag", strLike, "string"), ("l_linestatus", strLike, "string"),
      ("l_shipdate", timeLike, "timestamp/date")),
    "events" -> Seq(
      ("event_id", intLike, "int"),
      ("ts", timeLike, "timestamp (nanos-as-long / micros / micros-ntz)"),
      ("user_id", intLike, "int"), ("event_type", strLike, "string"),
      ("value", dblLike, "double"), ("props", strLike, "string")),
    "documents" -> Seq(
      ("doc_id", intLike, "int"), ("text", strLike, "string"),
      ("lang", strLike, "string"), ("source", strLike, "string"),
      ("n_chars", intLike, "int")),
    "embeddings" -> Seq(
      ("vec_id", intLike, "int"), ("embedding", floatVec, "array<float>"),
      ("label", intLike, "int")))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    expected.get(name).foreach { cols =>
      val byName = df.schema.map(f => f.name -> f.dataType).toMap
      val drift = cols.flatMap { case (c, ok, want) =>
        byName.get(c) match {
          case None                    => Some(s"$c MISSING (want $want)")
          case Some(t) if !ok(t)       => Some(s"$c is ${t.simpleString} (want $want)")
          case _                       => None
        }
      }
      if (drift.nonEmpty)
        throw new IllegalStateException(
          s"[graft] schema drift in $dir/$name.parquet: ${drift.mkString("; ")}. " +
            s"Actual schema: ${df.schema.simpleString}")
    }
    df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** The events table's time column has changed physical type across
    * testdata generations (TIMESTAMP(NANOS), then TIMESTAMP(MICROS)
    * without UTC adjustment); [[normalizeEventTime]] adapts, exposing the
    * engine's canonical pair regardless of generation:
    *   - `ts_ns` — epoch nanoseconds, LongType (ordering/arithmetic column)
    *   - `ts`   — TimestampType at µs precision (windowing/watermark column)
    *
    * NOTE deliberate session-level setting: Spark has no per-read option
    * for nanosAsLong (ParquetOptions exposes only compression/rebase/
    * mergeSchema), so it cannot be scoped to one scan. GraftSession sets
    * it at build time; setting it here too keeps driver-built sessions
    * (Verify/Bench contract) working. Effect on other reads: parquet
    * TIMESTAMP(NANOS) columns — which µs-based Spark would otherwise
    * reject outright — surface as LongType everywhere in the session.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTime(load(s, d, "events"))
  }

  /** Adapt whatever physical `ts` the events parquet carries to the
    * canonical (`ts_ns` LongType epoch-nanos, `ts` TimestampType) pair.
    * All graft sessions run with session timezone UTC, so the NTZ→TZ cast
    * is the identity instant mapping — the same one DuckDB's
    * `epoch_ns(ts)` oracle side applies.
    */
  def normalizeEventTime(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => // TIMESTAMP(NANOS) parquet read via nanosAsLong
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000"))) // integer div: double division loses precision at 1e18 ns
    case TimestampType =>
      df.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    case TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
        .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    case other =>
      throw new IllegalStateException(
        s"[graft] events.ts has unsupported type ${other.simpleString} " +
          "(want nanos-as-long, timestamp, or timestamp_ntz)")
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
