package graft

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8)
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        val cartesian = plan.contains("CartesianProduct")
        if (bnlj || cartesian) println(s"NONEQUI $name bnlj=$bnlj cartesian=$cartesian")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(80)}") }
      spark.catalog.clearCache()
    }
    println("sweep done")
    spark.stop()
  }
}
