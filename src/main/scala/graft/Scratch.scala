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
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.as("x").join(li.as("y"), Seq("l_orderkey"))
      .where(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct().persist()
    t("edge build")(e.count())
    val bidir = e.unionByName(e.select(col("b").as("a"), col("a").as("b"))).persist()
    t("bidir")(bidir.count())
    val seed = t("seed")(bidir.groupBy("a").agg(count(lit(1)).as("deg"))
      .orderBy(desc("deg"), col("a")).limit(1).head().getLong(0))
    var visited = spark.range(1).select(lit(seed).as("node"), lit(0L).as("hop")).persist()
    visited.count()
    for (h <- 1L to 3L) {
      val frontier = visited.where(col("hop") === (h - 1)).select("node")
      val reached = frontier.join(bidir, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(broadcast(visited), Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("hop"))
      val next = visited.unionByName(reached).persist()
      t(s"round $h")(next.count()); visited.unpersist(); visited = next
    }
    spark.stop()
  }
}
