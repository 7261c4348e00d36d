package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8)
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"

    // bucketed co-located join: plan must be exchange-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sinks.Bucketed.write(Tables.lineitem(spark, dir), "li_b", Seq("l_orderkey"), 4)
    sinks.Bucketed.write(Tables.orders(spark, dir), "ord_b", Seq("o_orderkey"), 4)
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    println("bucketed join shuffle-free: " + !plan.contains("Exchange hashpartitioning"))
    println("bucketed join rows: " + joined.count())
    // contrast: same join over raw parquet DOES shuffle
    val raw = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
    println("raw join shuffles: " +
      raw.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    // profiling over a frame with real nulls (asof output has nulls)
    val ev = Tables.events(spark, dir)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_ns"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_ns"))
    val withNulls = ops.AsOf.joinLastPrior(errors, purchases, "user_id", "ts_ns", Seq("event_id"))
    ops.Profile.profile(withNulls, Seq("event_id", "asof_event_id")).show(5, false)

    // approx distinct sketch output
    SparkEntry.queries("q_approx_distinct")(spark, dir).show(5)

    // minhash bucket cap at library surface: tiny cap must not drop real dup
    val corpus = ((1L to 25L).map(i => (i, "same boilerplate text repeated verbatim here")) ++
      Seq((100L, "a genuinely unique duplicate pair about query engines"),
          (101L, "a genuinely unique duplicate pair about query engines"))).toDF("doc_id", "text")
    dedup.Dedup.minhashCandidates(corpus, minEstJaccard = 0.3, maxBucketSize = 10).show(5)
    spark.stop()
  }
}
