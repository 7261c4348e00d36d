package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"TIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, 32)
    val dir = "/root/testdata/sf0.1"

    // 1. SQL surface via GraftExtensions (session built withExtensions)
    spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("documents")
    spark.sql(
      """SELECT doc_id, text_minhash_sig(text, 8) AS sig,
        |       simhash64(array(xxhash64(text))) AS sh
        |FROM documents LIMIT 3""".stripMargin).show(3, 50)

    // 2. TopK physical plan: expect TopKPerKeyExec + ONE exchange, no sort
    val projected = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("total_cents"))
    val topk = plans.TopK.perKey(projected, Seq("o_orderpriority"),
      Seq("total_cents" -> true, "o_orderkey" -> false), 3)
    topk.explain()
    println("topk rows: " + topk.count())

    // 3. Codegen check: fused minhash inside a WholeStageCodegen span?
    val sigPlan = dedup.Dedup.signatures(Tables.documents(spark, dir))
    sigPlan.explain()

    // 4. Perf: TopK operator vs window row_number at sf0.1 (warm both)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority").orderBy(col("total_cents").desc, col("o_orderkey").asc)
    val viaWindow = projected.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
    viaWindow.count(); topk.count() // warm
    time("window_topn")(viaWindow.count())
    time("topk_operator")(topk.count())

    // 5. Probe: k larger than group size
    println("k>group rows: " + plans.TopK.perKey(
      Tables.region(spark, dir), Seq("r_regionkey"), Seq("r_name" -> false), 100).count())
    spark.stop()
  }
}
