package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, batched feature extraction over partitions.
  *
  * The image/audio codec libraries are not in this container, so the
  * decode step is a clearly-marked deterministic stub (`fakeDecode`) —
  * the Spark-side contract (schema, batch iteration shape, partition
  * sizing) is real and tested. At scale: media rides in its own column
  * so projection pruning keeps metadata-only queries from reading bytes;
  * partitions are byte-bounded via files.maxPartitionBytes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], format: String)
  case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: String, features: Array[Float])

  /** Build a media frame from any (id, payload) source — here the
    * documents table, payload = utf-8 bytes standing in for image bytes.
    */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("text/plain").as("format"))

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec. Real deployments swap this body for e.g. JPEG decode +
    * model features; the signature (bytes -> fixed-length float vector)
    * and the batched per-partition driver below are the real contract.
    */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val n = bytes.length
    Array.tabulate(8) { i =>
      var acc = 1469598103934665603L ^ (i.toLong * 1099511628211L)
      var j = i
      while (j < n) { acc = (acc ^ bytes(j)) * 1099511628211L; j += 64 }
      (acc % 1000L).toFloat / 1000f
    }
  }

  /** Batched feature extraction: one decoder instance per partition
    * (mapPartitions), amortizing codec setup exactly like a Pandas UDF
    * batch would; returns typed rows.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec init would happen here, once per partition
        it.map { case (id, bytes) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val sum = md.digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(id, bytes.length.toLong, sum, fakeDecode(bytes))
        }
      }
  }
}
