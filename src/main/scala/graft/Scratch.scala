package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8)
    val dir = "/root/testdata/sf0.01"

    def scanAudit(name: String): Unit = {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val reads = "ReadSchema: ([^\n]*)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
      println(s"== $name scans ==")
      reads.foreach(r => println(s"  $r"))
    }
    Seq("text_gopher_quality", "dedup_contaminated", "text_chunk_windows",
      "pipe_pack_budget", "samp_stratified", "vec_int8_quant").foreach(scanAudit)

    // timing probe for pipe_corpus_prep stages at sf0.1
    val sf = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sf)
    time("warm docs")(docs.count())
    time("exact dedup")(dedup.Dedup.exact(docs).count())
    val surv = docs.join(dedup.Dedup.exact(docs).select(col("doc_id")), Seq("doc_id"), "left_semi")
    val cand = time("minhashCandidates")(dedup.Dedup.minhashCandidates(surv, minEstJaccard = 0.8))
    time("corpus_prep full")(pipeline.CorpusPrep.clean(docs).count())
    cand.unpersist()
    spark.stop()
  }
}
