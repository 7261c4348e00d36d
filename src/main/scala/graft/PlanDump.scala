package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only measurement harness (guide §1.2/§7.2): writes
  * `.explain("formatted")` for named query keys to
  * `plans/<tag>/<key>_<suffix>.txt` so optimization rounds can commit
  * before/after plan evidence. Note iterative keys (BFS loops, k-means
  * fits, sweeps) execute intermediate jobs inside the builder; the dump
  * captures the FINAL frame's plan plus, where the key registers them,
  * the per-round planObservations record.
  *
  * Usage: runMain graft.PlanDump <suffix> <key> [key...]
  *   SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_PLAN_DIR  output dir (default plans/r14)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val keys = args.tail.toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r14")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    TmpDirs.sweepStale()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val obs = SparkEntry.planObservations.get(k)
        .map(o => s"\n-- planObservations[$k]:\n$o\n").getOrElse("")
      Files.writeString(Paths.get(s"$outDir/${k}_$suffix.txt"), plan + obs)
      println(s"[plandump] wrote $outDir/${k}_$suffix.txt")
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
    }
    spark.stop()
  }
}
