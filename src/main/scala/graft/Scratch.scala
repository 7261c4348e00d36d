package graft

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8)
    val plan = SparkEntry.queries("snk_clustered")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    "PushedFilters: ([^\n]*)".r.findAllMatchIn(plan).map(_.group(1)).foreach(p => println(s"PUSHED $p"))
    spark.stop()
  }
}
