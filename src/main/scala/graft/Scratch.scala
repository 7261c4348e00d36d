package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8)
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"

    // IVF vs brute-force recall on the same queries
    val emb = Tables.embeddings(spark, dir)
    val bf = ann.Ann.bruteForceTopK(emb, Seq(0L, 1L, 2L, 3L, 4L), 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = ann.Ann.ivfTopK(emb, Seq(0L, 1L, 2L, 3L, 4L), 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    println(s"IVF recall vs brute force: ${(bf & ivf).size}/${bf.size}")

    // as-of join invariant: matched purchase must precede (or equal) the error ts
    val ev = Tables.events(spark, dir)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("value"))
    val joined = ops.AsOf.joinLastPrior(errors, purchases, "user_id", "ts_ns", Seq("event_id", "ts_ns"))
    val bad = joined.where(col("asof_ts_ns") > col("ts_ns")).count()
    val matched = joined.where(col("asof_event_id").isNotNull).count()
    val total = joined.count()
    println(s"asof: $total errors, $matched matched, $bad VIOLATIONS (must be 0)")

    // probe: empty right side -> all-null asof columns, row count preserved
    val emptyRight = purchases.where(lit(false))
    val j2 = ops.AsOf.joinLastPrior(errors, emptyRight, "user_id", "ts_ns", Seq("event_id"))
    println(s"asof empty-right: rows ${j2.count()} (want ${errors.count()}), " +
      s"nonnull ${j2.where(col("asof_event_id").isNotNull).count()} (want 0)")

    // probe: Salt with 1 bucket == plain groupBy
    val s1 = ops.Salt.sumsSkewed(Tables.lineitem(spark, dir), Seq("l_returnflag"),
      col("l_orderkey"), Seq("sq" -> col("l_quantity").cast("long")), buckets = 1)
      .orderBy("l_returnflag").collect().map(_.toSeq)
    val s16 = ops.Salt.sumsSkewed(Tables.lineitem(spark, dir), Seq("l_returnflag"),
      col("l_orderkey"), Seq("sq" -> col("l_quantity").cast("long")), buckets = 16)
      .orderBy("l_returnflag").collect().map(_.toSeq)
    println("salt bucket-1 == bucket-16: " + (s1.toSeq == s16.toSeq))
    spark.stop()
  }
}
