package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    TmpDirs.sweepStale()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (k <- Seq("mm_frames", "mm_resize", "mm_frames", "mm_resize", "mm_frames")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(k)(spark, dir).count()
      println(f"[solo] $k%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
    }
    spark.stop()
  }
}
