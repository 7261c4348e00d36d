package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8)
    val dir = "/root/testdata/sf0.01"

    // Two-phase topk plan: expect partial TopKPerKey BELOW the exchange
    // and final ABOVE it
    val projected = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("total_cents"))
    val topk = plans.TopK.perKey(projected, Seq("o_orderpriority"),
      Seq("total_cents" -> true, "o_orderkey" -> false), 3)
    println(topk.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("TopKPerKey") || l.contains("Exchange"))
      .mkString("\n"))
    println("topk rows: " + topk.count())

    // ANN rank path now flows through TopKPerKey: same oracle-checked output
    val emb = Tables.embeddings(spark, dir)
    val bf = ann.Ann.bruteForceTopK(emb, Seq(0L), 10)
    println(bf.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("TopKPerKey")).mkString("\n"))
    bf.show(3)

    // session_window vs lag-based session count consistency
    val sw = SparkEntry.queries("q_events_session_window")(spark, dir)
    val lag = SparkEntry.queries("q_events_session")(spark, dir)
    val swSessions = sw.count()
    val lagSessions = lag.agg(sum("n_sessions")).collect()(0).getLong(0)
    println(s"sessions: native=$swSessions lag-based=$lagSessions (must be equal)")
    spark.stop()
  }
}
