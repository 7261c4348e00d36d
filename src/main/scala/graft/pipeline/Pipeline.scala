package graft.pipeline

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parallel multi-table load — the Spark-first re-expression of
  * `hdf_to_postgres(processes=N)` (reference:
  * pandas_to_postgres/hdf_to_postgres.py:106-201). The reference forks a
  * multiprocessing.Pool because pandas is single-threaded; in Spark each
  * load is already a distributed job, and running the *jobs* concurrently
  * (Scala Futures + FAIR scheduler pools) keeps the cluster saturated
  * when an individual table's write is sink-bound — same motivation,
  * cluster-native mechanism.
  */
object ParallelLoad {

  /** Run `loads` (name -> action) with at most `parallelism` concurrent
    * Spark jobs. Returns (name, rowsLoaded) in input order; fails fast on
    * the first error like Pool.starmap_async().get().
    */
  def run(
      spark: SparkSession,
      loads: Seq[(String, () => Long)],
      parallelism: Int = 4): Seq[(String, Long)] = {
    val ec = ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(math.max(1, parallelism)))
    try {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "graft-load")
      val futures = loads.map { case (name, action) =>
        Future {
          spark.sparkContext.setJobGroup(s"graft-load-$name", name, interruptOnCancel = true)
          name -> action()
        }(ec)
      }
      futures.map(f => Await.result(f, Duration.Inf))
    } finally ec.shutdown()
  }
}

/** Load accounting — the reference tracks `self.rows` per copy
  * (`copy_df.py:33`, `copy_hdf.py:107`). Spark-first: `observe()` metrics
  * ride along with the write job itself (zero extra scans), exposed via
  * the returned observation.
  */
object LoadReport {

  /** Attach row/byte observation to a frame before a sink write. After
    * the write action completes, read `observation.get`.
    */
  def observed(df: DataFrame, name: String): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val cols = df.columns
    val sizeExpr = cols.map(c => coalesce(length(col(c).cast("string")), lit(0))).reduce(_ + _)
    (df.observe(obs, count(lit(1)).as("rows"), sum(sizeExpr).as("approx_bytes")), obs)
  }
}
