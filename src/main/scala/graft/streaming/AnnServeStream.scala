package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.TmpDirs
import graft.ann.Pq

/** Streaming ANN serving: query vectors arrive on a stream and every
  * micro-batch probes the PERSISTED PQ index through the SAME batch
  * probe function (`Pq.Index.topK`) inside foreachBatch — the
  * batch-function-reuse discipline of CorpusPrepStream/IncrementalStream
  * applied to the vector-serving path. The index is built OFFLINE, once;
  * serving touches only the 16×-compressed code table, and each
  * micro-batch's work is |batch queries| × codes-scan with the codebook
  * as driver metadata — no state store, no corpus shuffle, restart =
  * source offsets + the immutable index.
  */
object AnnServeStream {

  /** Streaming source over the embeddings parquet in `dir` (schema
    * probed from the files, footer-only read — the EventsStream
    * discipline), filtered to the query-id set.
    */
  def querySource(spark: SparkSession, dir: String, queryIds: Seq[Long]): DataFrame = {
    val schema: StructType = spark.read.parquet(s"$dir/embeddings.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
      .where(col("vec_id").isInCollection(queryIds))
  }

  /** Drive the (finite) query stream to completion, probing the index
    * per micro-batch; returns all results. At scale the sink is the
    * serving layer; here results append to scratch parquet so the spec
    * can compare against the one-shot batch probe.
    */
  def serve(spark: SparkSession, dir: String, indexPath: String,
      queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val outDir = s"${TmpDirs.create("annserve")}/res"
    val q = querySource(spark, dir, queryIds).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-batch queries are a bounded workload set (the lshTopK
        // broadcast contract) — collecting them is the serving model
        val qs = batch.select("vec_id", "embedding").collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
          .sortBy(_._1)
        if (qs.nonEmpty)
          Pq.Index.topK(spark, indexPath, qs, k)
            .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(outDir)
  }
}
