package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness (guide §1.5/§7.1 without the UI): runs
  * one key and prints every Spark job's wall time and description, so
  * iterative operators' per-round job budgets are visible in a headless
  * sandbox. Usage: runMain graft.JobTimer <key> [key...]
  */
object JobTimer {
  def main(args: Array[String]): Unit = {
    TmpDirs.sweepStale()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          println(f"[job ${je.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      }
    })
    args.foreach { k =>
      // warmup pass pays codegen + build-once artifacts; jobs printed anyway
      println(s"==== $k warmup ====")
      SparkEntry.queries(k)(spark, dir).count()
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
      Thread.sleep(500)
      println(s"==== $k timed ====")
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, dir).count()
      println(f"==== $k total ${(System.nanoTime() - t0) / 1e9}%6.2f s ====")
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
    }
    spark.stop()
  }
}
