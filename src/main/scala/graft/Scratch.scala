package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (k <- Seq("q_small_qty_revenue", "q_events_bitmap_retention", "q_order_count_dist")) {
      println(s"===== $k")
      SparkEntry.queries(k)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
