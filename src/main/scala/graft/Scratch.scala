package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {

  /** Sums shuffle write bytes across all stages between reset() calls. */
  final class ShuffleMeter extends SparkListener {
    @volatile var writeBytes = 0L
    @volatile var readBytes = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      writeBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      readBytes += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
    }
    def reset(): Unit = { writeBytes = 0L; readBytes = 0L }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(8, 8)
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val docs = Tables.documents(spark, dir)

    // NEW path: b-bit sketch est-join (what minhashCandidates now does)
    meter.reset()
    val cand = dedup.Dedup.minhashCandidates(docs, minEstJaccard = 0.5)
    val nNew = cand.count()
    cand.unpersist(blocking = true)
    Thread.sleep(2000) // let the listener bus drain stage events
    println(s"NEW sketch est-join: rows=$nNew shuffleWrite=${meter.writeBytes} shuffleRead=${meter.readBytes}")

    // OLD path replica: candidate pairs re-join the FULL 128-long signatures
    meter.reset()
    val k = 128; val bands = 16; val rows = k / bands
    val sigsAll = dedup.Dedup.signatures(docs, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = sigsAll.where(col("sig").isNotNull)
    val banded = sigs
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            j => struct(j.as("band"), xxhash64(j, slice(col("sig"), j * rows + 1, lit(rows))).as("bh"))))
          .as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val bucketW = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    val bounded = banded
      .withColumn("bucket_n", count(lit(1)).over(bucketW))
      .where(col("bucket_n") <= 1000)
      .drop("bucket_n")
    val pairs = bounded.as("l")
      .join(bounded.as("r"), Seq("band", "bh"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val estOld = pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn(
        "est_jaccard",
        aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0),
          (acc, v) => acc + v).cast("double") / k)
      .where(col("est_jaccard") >= 0.5)
      .select("doc_a", "doc_b", "est_jaccard")
    val nOld = estOld.count()
    Thread.sleep(2000) // let the listener bus drain stage events
    println(s"OLD full-sig est-join: rows=$nOld shuffleWrite=${meter.writeBytes} shuffleRead=${meter.readBytes}")

    // At-scale condition: the candidate set is too big to broadcast, so
    // the corpus-side payload must cross the est-join shuffle. Compare
    // shuffling full 64-bit signatures vs 16-bit sketches for the SAME
    // pair set (pairs cached above; only est-join stages differ).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val pairsC = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairsC.count()
    val sk = sigs.select(
      col("doc_id"),
      transform(col("sig"), x => (x.bitwiseAND(lit(0xffffL)) - lit(32768L)).cast("short")).as("sk"))
    def estOf(frame: org.apache.spark.sql.DataFrame, c: String) = pairsC
      .join(frame.select(col("doc_id").as("doc_a"), col(c).as("va")), "doc_a")
      .join(frame.select(col("doc_id").as("doc_b"), col(c).as("vb")), "doc_b")
      .withColumn(
        "est_jaccard",
        aggregate(
          zip_with(col("va"), col("vb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0),
          (acc, v) => acc + v).cast("double") / k)
      .where(col("est_jaccard") >= 0.5)

    meter.reset()
    val nSk = estOf(sk, "sk").count()
    Thread.sleep(2000)
    println(s"NOBCAST sketch est-join: rows=$nSk shuffleWrite=${meter.writeBytes} shuffleRead=${meter.readBytes}")

    meter.reset()
    val nSig = estOf(sigs, "sig").count()
    Thread.sleep(2000)
    println(s"NOBCAST full-sig est-join: rows=$nSig shuffleWrite=${meter.writeBytes} shuffleRead=${meter.readBytes}")

    pairsC.unpersist(blocking = true)
    sigsAll.unpersist(blocking = true)
    spark.stop()
  }
}
