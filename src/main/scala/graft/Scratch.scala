package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, 32)
    val sf = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sf)
    time("warm")(docs.count())
    val edges = time("blockedNgramJaccard")(dedup.Dedup.blockedNgramJaccard(docs))
    println("edges: " + edges.count())
    val labels = time("minLabel")(dedup.Components.minLabel(edges.select("doc_a", "doc_b")))
    println("labels: " + labels.count())
    labels.unpersist(); edges.unpersist()
    spark.catalog.clearCache()
    time("full dedup_clusters query")(SparkEntry.queries("dedup_clusters")(spark, sf).count())
    time("ann_ivf_kmeans query")(SparkEntry.queries("ann_ivf_kmeans")(spark, sf).count())
    spark.stop()
  }
}
