package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Local test harnesses (Verify/Bench) build their own sessions per the
  * driver contract; this factory is the library entry point for users and
  * specs. Defaults chosen for the 100 TB contract: AQE on (runtime skew
  * handling + coalescing), UTC (oracle parity), explicit shuffle
  * parallelism instead of Spark's 200 default.
  */
object GraftSession {
  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // NOTE deliberately NOT setting canChangeCachedPlanOutputPartitioning:
      // letting AQE re-partition under persisted frames coalesces small-
      // bytes/compute-heavy caches (minhash signatures) to one partition
      // and collapses downstream parallelism — measured 2x bench slowdown.
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) parquet (events table) as LongType: no per-read
      // option exists, so it is an explicit engine-level default here
      // rather than a hidden mutation inside a loader.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
