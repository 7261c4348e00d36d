package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of `q_values_benford` — the fraud/corruption screen
  * run ON THE INGEST PATH instead of after the fact: order totals
  * stream in, the per-digit counts are maintained as a complete-mode
  * 9-group aggregate (state = 9 rows, the cheapest possible stateful
  * query), and the Benford expectation join happens at the PUBLISH
  * boundary (a static 9-row spine — constants don't belong in stream
  * state). BenfordStreamSpec pins stream ≡ batch: after the finite
  * file source drains, the published frame equals the batch key's
  * output row-for-row.
  */
object BenfordStream {

  private val expPml = Seq(301L, 176L, 124L, 96L, 79L, 66L, 57L, 51L, 45L)

  /** Streaming source over the orders parquet (schema probed from one
    * batch footer read, the EventsStream contract).
    */
  def source(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/orders.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "orders.parquet")
      .parquet(dir)
  }

  /** The maintained state: per leading-digit counts of the cents total. */
  def digitCounts(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runToMemory(
      spark,
      source(spark, dir)
        .select(substring(round(col("o_totalprice") * 100, 0).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n")),
      "benford_stream_counts", "complete")

  /** Publish-time join with the static Benford spine — identical shape
    * to the batch key's output.
    */
  def publish(spark: SparkSession, counts: DataFrame): DataFrame = {
    val spine = spark.createDataFrame(
      (1 to 9).map(d => (d.toLong, expPml(d - 1)))).toDF("digit", "exp_pml")
    // Empty/undrained stream: sum over zero rows is NULL and total=0 would
    // divide by zero — publish an all-zero frame instead of crashing.
    val total = math.max(1L,
      counts.agg(coalesce(sum("n"), lit(0L)).as("total")).head().getLong(0))
    broadcast(spine).join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        expr(s"coalesce(n, 0) * 1000 div $total").as("obs_pml"), col("exp_pml"),
        (expr(s"coalesce(n, 0) * 1000 div $total") - col("exp_pml")).as("dev_pml"))
      .orderBy("digit")
  }

  def run(spark: SparkSession, dir: String): DataFrame =
    publish(spark, digitCounts(spark, dir))
}
