package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, 4)
    import spark.implicits._

    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")

    // probe 1: duplicate keys in updates
    val dupUpdates = Seq((2L, "B1"), (2L, "B2")).toDF("k", "v")
    println("dup-key merge:")
    ops.Merge.upsert(target, dupUpdates, "k").orderBy("k", "v").show()

    // probe 2: explicit null in an update column
    val nullUpdates = Seq((2L, null.asInstanceOf[String])).toDF("k", "v")
    println("null-update merge:")
    ops.Merge.upsert(target, nullUpdates, "k").orderBy("k").show()

    // partitioned refresh twice in a row (dynamic overwrite idempotence)
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("p2").toString
    val orders = Tables.orders(spark, dir).withColumn("yr", year(col("o_orderdate")))
    sinks.Refresh.overwrite(orders, s"$tmp/o", partitionBy = Seq("yr"))
    sinks.Refresh.overwrite(orders.where(col("yr") === 1997), s"$tmp/o", partitionBy = Seq("yr"))
    val total = spark.read.parquet(s"$tmp/o").count()
    println(s"dynamic overwrite: ${orders.count()} original, after partial refresh $total (must equal — only 1997 replaced)")
    spark.stop()
  }
}
