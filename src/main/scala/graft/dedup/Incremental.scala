package graft.dedup

import graft.functions.exprs
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Incremental (delta) deduplication: classify an incoming batch of
  * documents against a previously indexed corpus WITHOUT reprocessing
  * the historical text.
  *
  * The index is three per-doc-small parquet frames built once from the
  * history (and appendable batch-over-batch):
  *   - `keys`     (content_key, doc_id): md5 of canonical text, min
  *     history doc_id per key — the exact tier.
  *   - `bands`    (band, bh, doc_id): 16-band minhash LSH bucket keys —
  *     the candidate tier. Buckets larger than `maxBucketSize` inside
  *     the history are dropped at BUILD time (boilerplate collisions,
  *     same guard as [[Dedup.minhashCandidates]]), so a pathological
  *     bucket can never dominate any future incremental join.
  *   - `sketches` (doc_id, sk): 16-bit b-bit minwise sketches — the
  *     verify tier (est-jaccard without the 64-bit signatures).
  *
  * 100 TB shape: an incoming batch is orders of magnitude smaller than
  * the corpus, so every join here broadcasts the batch side and streams
  * the index — history text is never re-read, no index-side shuffle at
  * all (the three index frames are scanned once each, map-side). The
  * only kernel work is one fused minhash pass over the new batch.
  * Reference analog: the incremental-refresh half of hdf_to_postgres.py
  * (load only what changed) applied to the dedup surface.
  */
object Incremental {

  final case class Index(keys: DataFrame, bands: DataFrame, sketches: DataFrame)

  private val K = 128
  private val Bands = 16
  private val Rows = K / Bands

  /** (doc_id, sig) -> (doc_id, band, bh) LSH bucket keys — identical
    * construction to [[Dedup.minhashCandidates]] (same xxhash64 band
    * hash, so index and batch keys agree across sessions).
    */
  private def bandKeys(sigs: DataFrame): DataFrame = sigs
    .select(
      col("doc_id"),
      explode(
        transform(
          sequence(lit(0), lit(Bands - 1)),
          j => struct(j.as("band"), xxhash64(j, slice(col("sig"), j * Rows + 1, lit(Rows))).as("bh"))))
        .as("b"))
    .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))

  private def sketch(sigs: DataFrame): DataFrame = sigs.select(
    col("doc_id"),
    transform(col("sig"), x => (x.bitwiseAND(lit(0xffffL)) - lit(32768L)).cast("short")).as("sk"))

  /** ONE kernel pass over the text: (doc_id, content_key, sig). Every
    * index/classify path derives from this frame so no caller ever
    * walks a document twice (md5 and the 128-perm minhash share the
    * canonicalization subtree inside one whole-stage-codegen span).
    */
  private def withSigs(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"), Text.fingerprintMd5(col("text")).as("content_key"),
    exprs.text_minhash_sig(col("text"), K, 3).as("sig"))

  /** Write one index segment (keys + capped bands + sketches) from a
    * persisted `withSigs` frame. The bucket cap applies within the
    * segment being written.
    */
  private def writeSegment(sigsAll: DataFrame, dir: String,
      maxBucketSize: Int, mode: String): Unit = {
    // r14 (guide §2.6, overlap independent jobs): the three segment
    // writes are independent consumers of the SAME persisted signature
    // frame, so they run as concurrent driver-thread jobs instead of
    // three sequential actions — the later jobs' tasks back-fill
    // executors freed by the earlier jobs' tails. The cache is
    // materialized first so the kernel pass runs once, not raced.
    // Identical frames land at identical paths; only the wall-clock
    // changes.
    sigsAll.count()
    val sigs = sigsAll.where(col("sig").isNotNull)
    val bucketW = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    val writes: Seq[() => Unit] = Seq(
      () => sigsAll
        .groupBy("content_key").agg(min("doc_id").as("doc_id"))
        .write.mode(mode).parquet(s"$dir/keys"),
      () => bandKeys(sigs)
        .withColumn("bucket_n", count(lit(1)).over(bucketW))
        .where(col("bucket_n") <= maxBucketSize)
        .drop("bucket_n")
        .write.mode(mode).parquet(s"$dir/bands"),
      () => sketch(sigs).write.mode(mode).parquet(s"$dir/sketches"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = writes.map { w =>
      val t = new Thread(() => try w() catch { case e: Throwable => failures.add(e); () })
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    // a swallowed write failure would leave a silently partial index;
    // sibling failures ride along as suppressed exceptions (ADVICE r14:
    // only the first was surfaced, multi-write failures were
    // undiagnosable)
    if (!failures.isEmpty) {
      val head = failures.poll()
      var rest = failures.poll()
      while (rest != null) { head.addSuppressed(rest); rest = failures.poll() }
      throw head
    }
  }

  /** Build the dedup index from `history` and persist it under `dir`
    * (parquet; at scale: a table the next batch's classify pass reads).
    */
  def buildIndex(history: DataFrame, dir: String, maxBucketSize: Int = 1000): Unit = {
    val sigsAll = withSigs(history).persist(StorageLevel.MEMORY_AND_DISK)
    writeSegment(sigsAll, dir, maxBucketSize, "overwrite")
    sigsAll.unpersist(blocking = false)
  }

  /** Append `batch` to an existing index at `dir` (parquet append — at
    * scale an atomic table append). Keys are pre-aggregated within the
    * batch; the exact tier's `min(hist_id)` keeps cross-segment
    * duplicates of a key harmless. The bucket cap applies within the
    * appended segment; [[compact]] re-applies it globally (the same
    * periodic-OPTIMIZE contract as any LSM-shaped index).
    */
  def appendBatch(batch: DataFrame, dir: String, maxBucketSize: Int = 1000): Unit = {
    val sigsAll = withSigs(batch).persist(StorageLevel.MEMORY_AND_DISK)
    writeSegment(sigsAll, dir, maxBucketSize, "append")
    sigsAll.unpersist(blocking = false)
  }

  /** Re-apply the global bucket cap across all appended segments and
    * rewrite the bands store (write-to-scratch + swap: Spark refuses to
    * overwrite a path its own plan reads). Run periodically after a
    * series of appends — viral segments that crossed the cap only in
    * aggregate are evicted here.
    */
  def compact(spark: SparkSession, dir: String, maxBucketSize: Int = 1000): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val bands = new org.apache.hadoop.fs.Path(s"$dir/bands")
    val scratch = new org.apache.hadoop.fs.Path(s"$dir/bands_compacting")
    val bucketW = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    spark.read.parquet(bands.toString)
      .withColumn("bucket_n", count(lit(1)).over(bucketW))
      .where(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
      .write.mode("overwrite").parquet(scratch.toString)
    val fs = bands.getFileSystem(conf)
    fs.delete(bands, true)
    if (!fs.rename(scratch, bands))
      throw new IllegalStateException(s"compact: rename $scratch -> $bands failed")
  }

  def loadIndex(spark: SparkSession, dir: String): Index = Index(
    keys = spark.read.parquet(s"$dir/keys"),
    bands = spark.read.parquet(s"$dir/bands"),
    sketches = spark.read.parquet(s"$dir/sketches"))

  /** Classify every doc in `batch` against the index:
    *   - `exact`: canonical content hash already present in the history
    *     (match_id = the index's min doc_id for that key);
    *   - `near` : some history doc shares an LSH band bucket AND the
    *     sketch-estimated jaccard >= `minEstJaccard` (match_id = min
    *     such history doc_id);
    *   - `novel`: neither.
    * Returns (doc_id, verdict, match_id) for the whole batch; the result
    * is persisted and caller-owned (same contract as the Dedup family).
    */
  def classify(batch: DataFrame, ix: Index, minEstJaccard: Double = 0.5): DataFrame = {
    val sigsAll = withSigs(batch).persist(StorageLevel.MEMORY_AND_DISK)
    val out = classifySigs(sigsAll, ix, minEstJaccard)
    sigsAll.unpersist(blocking = false)
    out
  }

  /** [[classify]] body over a pre-computed, persisted [[withSigs]]
    * frame — lets [[classifyAndAbsorb]] reuse the SAME kernel output
    * for both the verdicts and the absorbed index segment.
    */
  private def classifySigs(sigsAll: DataFrame, ix: Index, minEstJaccard: Double): DataFrame = {
    val sigs = sigsAll.where(col("sig").isNotNull).select("doc_id", "sig")

    val exact = broadcast(sigsAll.select("doc_id", "content_key"))
      .join(ix.keys.withColumnRenamed("doc_id", "hist_id"), Seq("content_key"))
      .groupBy("doc_id").agg(min("hist_id").as("exact_id"))

    // candidate tier: tiny batch bands broadcast against the streamed
    // index bands — the index side never shuffles
    val cand = broadcast(bandKeys(sigs))
      .join(ix.bands.withColumnRenamed("doc_id", "hist_id"), Seq("band", "bh"))
      .select("doc_id", "hist_id").distinct()
    // verify tier: candidates are bounded by |batch| x Bands x
    // maxBucketSize (batch-scale, not corpus-scale), so the candidate
    // frame with its batch sketches broadcasts and the corpus-sized
    // sketch store streams through map-side — again no index shuffle
    val near = ix.sketches.select(col("doc_id").as("hist_id"), col("sk").as("sk_h"))
      .join(broadcast(cand.join(sketch(sigs), Seq("doc_id"))), Seq("hist_id"))
      .withColumn(
        "est",
        // fused one-pass slot compare (r14): same count, same /K estimate
        // as the aggregate(zip_with(when)) chain it replaces (R14OptSpec)
        graft.functions.vexprs.sketch_eq_count(col("sk"), col("sk_h")).cast("double") / K)
      .where(col("est") >= minEstJaccard)
      .groupBy("doc_id").agg(min("hist_id").as("near_id"))

    val out = sigsAll.select("doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("exact_id").isNotNull, lit("exact"))
          .when(col("near_id").isNotNull, lit("near"))
          .otherwise(lit("novel")).as("verdict"),
        coalesce(col("exact_id"), col("near_id")).as("match_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    out
  }

  /** One ingest step: classify `batch` against the index at `dir`, then
    * absorb its `novel` docs into the index so the NEXT step sees them.
    * This is the per-micro-batch body of streaming ingest dedup
    * ([[graft.streaming.IncrementalStream]]) and equally the per-delta
    * body of a batch backfill loop — one implementation for both.
    * Returns the classification (persisted, caller-owned).
    */
  def classifyAndAbsorb(batch: DataFrame, dir: String,
      minEstJaccard: Double = 0.5, maxBucketSize: Int = 1000): DataFrame = {
    val sigsAll = withSigs(batch).persist(StorageLevel.MEMORY_AND_DISK)
    val scored = classifySigs(sigsAll, loadIndex(batch.sparkSession, dir), minEstJaccard)
    // Snapshot BEFORE mutating the index: the segment write refreshes
    // every cached plan that scans the index path, so a merely persisted
    // verdict frame would lazily RECOMPUTE against the index it just
    // mutated (novel docs would re-classify as exact self-matches).
    // localCheckpoint cuts the lineage; the frame is batch-sized.
    val verdicts = scored.localCheckpoint(true)
    scored.unpersist(blocking = false)
    // absorb from the SAME kernel output — no second signature pass.
    // persisted: writeSegment's three concurrent writes all read it
    val novelSigs = sigsAll.join(
      verdicts.where(col("verdict") === "novel").select("doc_id"), Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    writeSegment(novelSigs, dir, maxBucketSize, "append")
    novelSigs.unpersist(blocking = false)
    sigsAll.unpersist(blocking = false)
    verdicts
  }
}
