package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R11 wave specs: mechanism invariants for this round's new operators
  * and hardening fixes, each independent of the implementation under
  * test.
  */
class IvfRqProbeSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("probe-only output is identical to the fit+probe key at the same parameters") {
    // the fits are deterministic, so the persisted index must serve the
    // exact frame the in-flight fit produces — the contract that lets
    // ann_ivfrq_probe reuse ann_ivfrq_topk's oracle
    val fitProbe = SparkEntry.queries("ann_ivfrq_topk")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val probeOnly = SparkEntry.queries("ann_ivfrq_probe")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(probeOnly.nonEmpty)
    assert(probeOnly === fitProbe)
  }

  test("a built index round-trips its codebooks and serves without refitting") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfrq_spec").toString
    try {
      val emb = Tables.embeddings(spark, dir)
      ann.IvfRq.Index.build(emb, tmp)
      val cents = ann.IvfRq.Index.loadCentroids(spark, tmp)
      val cb = ann.IvfRq.Index.loadCodebook(spark, tmp)
      assert(cents.length === 16 && cb.length === 16)
      assert(cents.forall(_.length === 64) && cb.forall(_.length === 64))
      // code table: one row per vector, both code columns in range
      val codes = spark.read.parquet(s"$tmp/codes")
      assert(codes.count() === emb.count())
      assert(codes.where(col("cell") < 0 || col("cell") > 15 ||
        col("rq_cell") < 0 || col("rq_cell") > 15).count() === 0)
      val served = ann.IvfRq.Index.probe(spark, tmp, emb, Seq(0L, 1L), k = 5)
      assert(served.count() === 10)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}

class BlockCapSpec extends AnyFunSuite {
  import TestSpark._

  test("a prefix block above maxBlockSize is dropped whole; smaller blocks are untouched") {
    import spark.implicits._
    // 5 near-identical docs share one prefix block; 2 share another
    val docs = ((1 to 5).map(i => (i.toLong, s"alpha beta gamma delta tail$i")) ++
      Seq((10L, "zeta eta theta iota"), (11L, "zeta eta theta iota kappa")))
      .toDF("doc_id", "text")
    val uncapped = dedup.Dedup.blockedNgramJaccard(docs).collect()
    assert(uncapped.length > 1) // both blocks pair up without a cap
    val capped = dedup.Dedup.blockedNgramJaccard(docs, maxBlockSize = 4)
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 5-doc boilerplate block is gone entirely...
    assert(pairs.forall { case (a, b) => a >= 10 && b >= 10 })
    // ...and the small block still reports its pair
    assert(pairs.contains((10L, 11L)))
  }

  test("pair stats respect the same cap") {
    import spark.implicits._
    val docs = (1 to 6).map(i => (i.toLong, s"one two three common$i")).toDF("doc_id", "text")
    assert(dedup.Dedup.blockedPairStats(docs, maxBlockSize = 5).count() === 0)
    assert(dedup.Dedup.blockedPairStats(docs, maxBlockSize = 6).count() === 15)
  }
}

class BandingSweepSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("the 16-band operating point reproduces dedup_minhash, and the curve is monotone") {
    val rows = SparkEntry.queries("dedup_banding_sweep")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(7)))).toMap
    assert(rows.keySet === Set(8L, 16L, 32L))
    // the (16, 8) point IS the default banding: its est>=0.5 survivors
    // must equal the standalone dedup_minhash key's pair count
    val mh = SparkEntry.queries("dedup_minhash")(spark, dir).count()
    assert(rows(16L)._2 === mh)
    // S-curve shape: more bands never loses candidates or recall
    assert(rows(8L)._1 <= rows(16L)._1 && rows(16L)._1 <= rows(32L)._1)
    assert(rows(8L)._4 <= rows(16L)._4 && rows(16L)._4 <= rows(32L)._4)
    // true positives never exceed est survivors
    rows.values.foreach { case (_, est, tp, _) => assert(tp <= est) }
  }
}

class EmptyInputGuardSpec extends AnyFunSuite {
  import TestSpark._

  test("BenfordStream.publish survives an empty drain with an all-zero frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("digit", "n")
    val out = streaming.BenfordStream.publish(spark, empty).collect()
    assert(out.length === 9)
    assert(out.forall(r => r.getLong(1) === 0L && r.getLong(2) === 0L))
  }

  test("Compaction.dataBytes sees files one partition level down") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("compact_spec").toString
    try {
      Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p")
        .write.partitionBy("p").parquet(s"$tmp/part")
      assert(sinks.Compaction.dataBytes(spark, s"$tmp/part") > 0)
      // and a mis-pointed compact fails loudly instead of mis-sizing
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/empty"))
      intercept[IllegalArgumentException] {
        sinks.Compaction.compact(spark, s"$tmp/empty", s"$tmp/out", 1024 * 1024)
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
