package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, 4)
    val dir = "/root/testdata/sf0.01"
    // Force unmatched customers: only orders from custkeys < 100 join
    val restricted = Tables.orders(spark, dir).where(col("o_custkey") < 100)
    val hist = Tables.customer(spark, dir)
      .join(restricted, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders")).agg(count(lit(1)).as("n_customers"))
      .orderBy("n_orders")
    hist.show(3)
    spark.stop()
  }
}
