package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (k <- Seq("q_top_supplier", "q_product_profit", "vec_hard_negatives")) {
      println(s"================ $k ================")
      SparkEntry.queries(k)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
