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

  /** STUB resize — deterministic fake standing in for an image resize
    * (e.g. libvips). Real contract: bytes -> bytes with target dims in
    * the metadata; the fake emits a dims header + truncated payload so
    * round-trip tests can assert on structure.
    */
  def fakeResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val header = s"RSZ:${w}x$h:".getBytes("UTF-8")
    val body = java.util.Arrays.copyOf(bytes, math.min(bytes.length, w * h))
    header ++ body
  }

  /** STUB frame sampling — deterministic fake standing in for video
    * frame extraction: n evenly-spaced "frames" (byte slices).
    */
  def fakeFrameSample(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (bytes.isEmpty || n <= 0) Seq.empty
    else {
      val stride = math.max(1, bytes.length / n)
      (0 until math.min(n, bytes.length)).map { i =>
        val start = i * stride
        java.util.Arrays.copyOfRange(bytes, start, math.min(bytes.length, start + stride))
      }
    }
  }

  case class ResizedMedia(doc_id: Long, media: Array[Byte], width: Int, height: Int)
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Batched resize over partitions — same batch shape as decode. */
  def resizeAll(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => ResizedMedia(id, fakeResize(bytes, w, h), w, h) })
  }

  /** Frame sampling: one input row fans out to n frame rows (the video ->
    * frames exploding shape; partition-local, no shuffle).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, n: Int): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        fakeFrameSample(bytes, n).zipWithIndex.map { case (f, i) => Frame(id, i, f) }
      })
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
