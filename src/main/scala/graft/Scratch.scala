package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    TmpDirs.sweepStale()
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (k <- Seq("q_events_peak_concurrency", "q_events_active_time", "text_vocab_growth")) {
      val p = SparkEntry.queries(k)(spark, dir).queryExecution.executedPlan.toString
      println(s"==== $k ====")
      p.split('\n').filter(l => l.contains("Window") || l.contains("SinglePartition"))
        .foreach(l => println(l.take(200)))
    }
    spark.stop()
  }
}
