package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM per `sbt test` fork). */
object TestSpark {
  lazy val spark: SparkSession = {
    TmpDirs.sweepStale() // reclaim scratch dirs from earlier/crashed runs
    // delete this fork's scratch dirs once every suite has finished
    Runtime.getRuntime.addShutdownHook(new Thread(() => TmpDirs.sweepRecorded()))
    GraftSession.local(4, 4)
  }
  val dir = "/root/testdata/sf0.001"
}

class TextSpec extends AnyFunSuite {
  import TestSpark._
  import graft.text.Text
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).collect()(0).get(0)

  test("wordCount counts canonical words") {
    assert(one("Hello,  World! 42", Text.wordCount(col("text"))) === 3L)
    assert(one("", Text.wordCount(col("text"))) === 0L)
    assert(one("...", Text.wordCount(col("text"))) === 0L)
  }

  test("wordOcc counts whole words only") {
    assert(one("the theater the", Text.wordOcc(col("text"), "the")) === 2L)
  }

  test("langId cascade prefers earlier language on ties") {
    assert(one("the und", Text.langId(col("text"))) === "en")
    assert(one("der und die das", Text.langId(col("text"))) === "de")
    assert(one("xyzzy", Text.langId(col("text"))) === "und")
  }

  test("shingles: short docs collapse to whole text") {
    assert(one("one two", Text.shingles(col("text"), 3)) ===
      Seq("one two"))
    assert(one("a b c d", Text.shingles(col("text"), 3)) ===
      Seq("a b c", "b c d"))
  }

  test("fingerprint is canonicalization-invariant") {
    assert(one("Hello  World!", Text.fingerprintMd5(col("text"))) ===
      one("hello world", Text.fingerprintMd5(col("text"))))
  }
}

class HashExprsSpec extends AnyFunSuite {
  import TestSpark._
  import graft.functions.exprs
  import graft.text.Text
  import spark.implicits._

  test("minhash signature: k slots, deterministic, permutation-invariant input order") {
    val df = Seq("a b c d e f g", "g f e d c b a").toDF("text")
      .select(exprs.minhash_sig(Text.hashedArray(Text.words(col("text"))), 16).as("sig"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length === 16)
    assert(rows(0) === rows(1)) // same word set => same signature
  }

  test("simhash: identical token sets collide, null on empty") {
    val df = Seq("x y z", "x y z", "").toDF("text")
      .select(exprs.simhash64(Text.hashedArray(Text.words(col("text")))).as("sh"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === rows(1).getLong(0))
    assert(rows(2).isNullAt(0))
  }

  test("wrong input types fail at analysis, not at read time") {
    val doubles = Seq(Seq(1.0, 2.0)).toDF("v") // array<double>
    val eDots = intercept[Exception] {
      doubles.select(exprs.plane_dots(col("v"), Seq(Seq(1.0, 0.0)))).collect()
    }
    assert(eDots.getMessage.contains("array<float>"), eDots.getMessage)
    val ints = Seq(Seq(1, 2)).toDF("v") // array<int>
    val eSim = intercept[Exception] {
      ints.select(exprs.simhash64(col("v"))).collect()
    }
    assert(eSim.getMessage.contains("array<bigint>"), eSim.getMessage)
    val eMin = intercept[Exception] {
      Seq(1L).toDF("v").select(exprs.text_minhash_sig(col("v"))).collect()
    }
    assert(eMin.getMessage.contains("string"), eMin.getMessage)
  }
}

class VecSpec extends AnyFunSuite {
  import TestSpark._
  import graft.vec.Vec
  import spark.implicits._

  test("cosineQ: self-similarity 1.0, orthogonal 0.0") {
    val df = Seq((Seq(1f, 0f, 2f), Seq(1f, 0f, 2f), Seq(0f, 5f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Vec.cosineQ(Vec.quantize(col("a")), Vec.quantize(col("b"))),
      Vec.cosineQ(Vec.quantize(col("a")), Vec.quantize(col("c")))).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) === 0.0)
  }

  test("hyperplanes deterministic across calls") {
    assert(Vec.hyperplanes(4, 8) === Vec.hyperplanes(4, 8))
  }
}

class DedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup
    (3L, "the quick brown fox jumps over the lazy dog again and again extra"), // near dup
    (4L, "completely different content about spark catalyst optimizer rules")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min doc_id per content") {
    val r = dedup.Dedup.exact(corpus).orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
    assert(r(0).getLong(1) === 2L) // doc 1+2 collapse
  }

  test("minhash LSH finds exact and near dup, not the unrelated doc") {
    val pairs = dedup.Dedup.minhashCandidates(corpus, minEstJaccard = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs at hamming 0") {
    val pairs = dedup.Dedup.simhashPairs(corpus)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("ngram jaccard verification on candidates") {
    val cands = Seq((1L, 2L), (1L, 4L)).toDF("doc_a", "doc_b")
    val r = dedup.Dedup.ngramJaccard(corpus, cands, minJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(r === Set((1L, 2L))) // unrelated pair filtered out
  }

  test("ngram anchor reps: O(n) output, dup group collapses to its anchor") {
    val r = dedup.Dedup.ngramAnchorReps(corpus, minJaccard = 0.5)
      .select("doc_id", "rep_id").as[(Long, Long)].collect().toMap
    // exactly one row per doc regardless of duplication rate
    assert(r.size === 4)
    // the exact and near dup both point at the block anchor (doc 1)...
    assert(r(1L) === 1L && r(2L) === 1L && r(3L) === 1L)
    // ...and the unrelated doc stays its own representative
    assert(r(4L) === 4L)
    // a planted 200-copy boilerplate group still emits one row per doc
    val viral = (0 until 200)
      .map(i => (100L + i, s"shared boilerplate header text for every mirror page number $i"))
      .toDF("doc_id", "text")
    val v = dedup.Dedup.ngramAnchorReps(viral, minJaccard = 0.5)
      .select("doc_id", "rep_id").as[(Long, Long)].collect()
    assert(v.length === 200)
    assert(v.forall(_._2 == 100L)) // all collapse to the min doc_id anchor
  }

  test("candidate functions release intermediates; caller owns only the result") {
    spark.catalog.clearCache()
    // delta-based: clearCache cannot drop localCheckpoint RDDs other suites
    // may have left, so compare against the pre-call persisted set
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val result = dedup.Dedup.minhashCandidates(corpus, minEstJaccard = 0.3)
    // exactly one NEW persisted RDD: the materialized candidate result
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size === 1, s"expected 1 new persisted RDD, got ${added.size}")
    result.unpersist(blocking = true)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}

class AnnSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bruteForceTopK: planted neighbor ranks first, self excluded") {
    val base = Seq.tabulate(64)(i => i.toFloat / 64f)
    val nearly = base.updated(0, 0.016f)
    val far = Seq.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)
    val emb = Seq(
      (0L, base), (1L, nearly), (2L, far), (3L, base.map(_ * 2f))
    ).toDF("vec_id", "embedding")
    val r = ann.Ann.bruteForceTopK(emb, Seq(0L), 3).orderBy("rnk").collect()
    assert(!r.map(_.getLong(1)).contains(0L))
    assert(r(0).getLong(1) === 3L || r(0).getLong(1) === 1L) // scaled copy cos=1 ranks top
    assert(r(0).getDouble(2) > 0.999)
  }
}

class AnnRecallSpec extends AnyFunSuite {
  import TestSpark._

  test("IVF recall@10 clears the probed-fraction floor vs brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(ann.Ann.bruteForceTopK(emb, qs, 10))
    val ivf = topSet(ann.Ann.ivfTopK(emb, qs, 10)) // nProbe=4 of 16 cells
    val recall = (exact & ivf).size.toDouble / exact.size
    // embeddings are near-random (max pairwise cosine ~0.44), so cell
    // assignment is weakly informative: probing 4/16 cells must still
    // beat a conservative floor below the 25% blind-probe baseline
    assert(recall >= 0.15, s"IVF recall@10 = $recall")
  }
}

class OpsSinksSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.types._

  test("Normalize.toSchema reports missing columns, casts present ones") {
    val df = Seq((1, "x")).toDF("a", "b")
    val (out, missing) = ops.Normalize.toSchema(df,
      StructType(Seq(StructField("a", LongType), StructField("zz", StringType))))
    assert(missing === Seq("zz"))
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(("a", LongType)))
  }

  test("Chunk.byRows preserves content, bounds partitions") {
    val df = spark.range(1000).toDF("id")
    val chunked = ops.Chunk.byRows(df, 100)
    assert(chunked.count() === 1000)
    assert(chunked.rdd.getNumPartitions === 10)
  }

  test("Hooks pipeline applies in order") {
    val hooks: Seq[ops.Hooks.Hook] = Seq(
      d => d.withColumn("x", col("id") * 2),
      d => d.where(col("x") > 10))
    assert(ops.Hooks.pipeline(hooks)(spark.range(10).toDF("id")).count() === 4)
  }

  test("SqlLifecycle emits the reference's lifecycle order") {
    val tc = sinks.TableConstraints("t", Some(("t_pk", Seq("id"))), Seq(("t_fk", "(a) REFERENCES u (b)")))
    val pre = sinks.SqlLifecycle.preLoad(tc, Some("1GB"))
    assert(pre.head.startsWith("SET maintenance_work_mem"))
    assert(pre.indexWhere(_.contains("DROP CONSTRAINT IF EXISTS t_fk")) <
      pre.indexWhere(_.contains("DROP CONSTRAINT IF EXISTS t_pk")))
    assert(pre.last.startsWith("TRUNCATE"))
    val post = sinks.SqlLifecycle.postLoad(tc)
    assert(post.head.contains("PRIMARY KEY"))
    assert(post.last === "ANALYZE t")
  }

  test("ParallelLoad returns per-table counts in input order") {
    val loads = Seq("a" -> (() => 1L), "b" -> (() => 2L))
    assert(pipeline.ParallelLoad.run(spark, loads) === Seq("a" -> 1L, "b" -> 2L))
  }
}

class EntrySpec extends AnyFunSuite {
  import TestSpark._

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs non-empty on sf0.001") {
    val empties = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty queries: $empties")
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming hourly counts match batch aggregation") {
    val streamed = streaming.EventsStream.runToMemory(
      spark, streaming.EventsStream.hourlyCounts(spark, dir), "ev_hourly")
    val batch = SparkEntry.queries("q_events_window")(spark, dir)
    val s = streamed.select("hour_start", "event_type", "n", "value_cents")
      .collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s === b)
  }
}

class TopKSpec extends AnyFunSuite {
  import TestSpark._

  test("TopKPerKey matches the window-function formulation") {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("total_cents"))
    val viaTopK = plans.TopK.perKey(
      orders, Seq("o_orderpriority"), Seq("total_cents" -> true, "o_orderkey" -> false), 3)
      .select("o_orderpriority", "o_orderkey", "total_cents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("total_cents").desc, col("o_orderkey").asc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).select("o_orderpriority", "o_orderkey", "total_cents")
    assert(viaTopK.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaTopK).isEmpty)
  }

  test("TopKPerKey rejects unknown columns at construction") {
    val orders = Tables.orders(spark, dir)
    val e = intercept[IllegalArgumentException] {
      plans.TopK.perKey(orders, Seq("nope"), Seq("o_orderkey" -> false), 1)
    }
    assert(e.getMessage.contains("nope"))
  }
}

class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._ // TestSpark.spark is built withExtensions(new GraftExtensions)

  test("GraftExtensions registers SQL functions") {
    val r = spark.sql(
      "SELECT text_minhash_sig('hello world hello world', 8) AS sig, " +
        "simhash64(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS sh, " +
        "shingle_block('one two three four', 2) AS sb")
      .collect()(0)
    assert(r.getSeq[Long](0).length === 8)
    assert(!r.isNullAt(1))
    assert(r.getStruct(2).getSeq[Long](1).length === 3) // 3 distinct 2-shingles
  }
}

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import mm.Multimodal

  test("PNG encode/decode round-trip is pixel-exact (real ImageIO codec)") {
    val docId = 42L
    val (w, h) = (Multimodal.srcWidth(docId), Multimodal.srcHeight(docId))
    val decoded = Multimodal.decodeImage(Multimodal.encodePng(Multimodal.syntheticImage(docId, 0, w, h)))
    assert(decoded.getWidth === w && decoded.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = Multimodal.pixelValue(docId, 0, x, y)
      assert((decoded.getRGB(x, y) & 0xffffff) === ((v << 16) | (v << 8) | v))
    }
  }

  test("nearest-neighbor resize is pixel-exact against the index formula") {
    val docId = 7L
    val (sw, sh) = (Multimodal.srcWidth(docId), Multimodal.srcHeight(docId))
    val src = Multimodal.decodeImage(Multimodal.encodePng(Multimodal.syntheticImage(docId, 0, sw, sh)))
    val out = Multimodal.resizeNearest(src, 8, 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = Multimodal.pixelValue(docId, 0, x * sw / 8, y * sh / 8)
      assert((out.getRGB(x, y) & 0xff) === v)
    }
  }

  test("Graphics2D bilinear resize: correct dims, deterministic across runs") {
    val src = Multimodal.syntheticImage(13L, 0, 16, 12)
    val a = Multimodal.encodePng(Multimodal.resizeBilinear(src, 8, 8))
    val b = Multimodal.encodePng(Multimodal.resizeBilinear(Multimodal.syntheticImage(13L, 0, 16, 12), 8, 8))
    assert(java.util.Arrays.equals(a, b))
    val back = Multimodal.decodeImage(a)
    assert(back.getWidth === 8 && back.getHeight === 8)
  }

  test("degenerate payloads: corrupt image rejected, empty video yields no frames") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val e = intercept[IllegalArgumentException](Multimodal.decodeImage(garbage))
    assert(e.getMessage.contains("undecodable"))
    assert(Multimodal.decodeVideo(Multimodal.encodeVideo(Seq.empty)).isEmpty)
    assert(Multimodal.sampleIndices(0, 3).isEmpty)
  }

  test("video container round-trip and evenly-spaced sampling") {
    val frames = (0 until 4).map(f => Multimodal.encodePng(Multimodal.syntheticImage(5L, f, 6, 6)))
    val back = Multimodal.decodeVideo(Multimodal.encodeVideo(frames))
    assert(back.length === 4)
    assert(back.zip(frames).forall { case (x, y) => java.util.Arrays.equals(x, y) })
    assert(Multimodal.sampleIndices(4, 8) === (0 until 4))  // n >= total: all
    assert(Multimodal.sampleIndices(4, 2) === Seq(0, 2))    // n < total: stride
  }

  test("distributed decode/resize/frame pipeline: real pixels, deterministic") {
    val docs = Tables.documents(spark, dir).limit(10)
    val resized = Multimodal.resizeAll(spark, Multimodal.imageFrame(spark, docs), 8, 8).collect()
    assert(resized.length === 10)
    resized.foreach { r =>
      assert(r.src_w === Multimodal.srcWidth(r.doc_id) && r.src_h === Multimodal.srcHeight(r.doc_id))
      val expected = (for (y <- 0 until 8; x <- 0 until 8)
        yield Multimodal.pixelValue(r.doc_id, 0, x * r.src_w / 8, y * r.src_h / 8).toLong).sum
      assert(r.px_sum === expected)
      // the re-encoded payload decodes back to the same raster
      val back = Multimodal.decodeImage(r.media)
      assert(back.getWidth === 8 && back.getHeight === 8 && Multimodal.pixelSum(back) === r.px_sum)
    }
    val frames = Multimodal.sampleFrames(spark, Multimodal.videoFrame(spark, docs), 3).collect()
    frames.foreach { f =>
      val fw = 6 + (((f.doc_id + f.src_idx) % 6L + 6L) % 6L).toInt
      assert(f.width === fw)
      val expected = (for (y <- 0 until f.height; x <- 0 until f.width)
        yield Multimodal.pixelValue(f.doc_id, f.src_idx, x, y).toLong).sum
      assert(f.px_sum === expected)
    }
    val feats = Multimodal.extractFeatures(spark, Multimodal.imageFrame(spark, docs)).collect()
    feats.foreach { ft =>
      val vals = for (y <- 0 until ft.height; x <- 0 until ft.width)
        yield Multimodal.pixelValue(ft.doc_id, 0, x, y).toLong
      val mean = vals.sum.toDouble / vals.length
      assert(ft.mean_r === mean && ft.mean_g === mean && ft.mean_b === mean)
    }
  }
}

class SessionStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("stateful streaming sessionization matches batch window-lag result") {
    val streamed = streaming.SessionStream.runToResult(spark, dir)
    val batch = SparkEntry.queries("q_events_session")(spark, dir)
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s === b)
  }
}

class BucketedSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      sinks.Bucketed.write(Tables.lineitem(spark, dir), "li_b", Seq("l_orderkey"), 4)
      sinks.Bucketed.write(Tables.orders(spark, dir), "ord_b", Seq("o_orderkey"), 4)
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class ProfileSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("profile reports nulls, distincts, min/max per column") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c"))).toDF("id", "s")
    val p = ops.Profile.profile(df, Seq("id", "s")).orderBy("col_name").collect()
    assert(p(0).getString(0) === "id" && p(0).getLong(1) === 0L && p(0).getLong(2) === 3L)
    assert(p(1).getString(0) === "s" && p(1).getLong(1) === 1L && p(1).getLong(2) === 2L)
    assert(p(1).getString(3) === "a" && p(1).getString(4) === "c")
  }

  test("approx distinct within 5% of exact on events") {
    val r = SparkEntry.queries("q_approx_distinct")(spark, dir).collect()
    r.foreach { row =>
      val (approx, exact) = (row.getLong(1), row.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
    }
  }
}

class FreqSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions.col

  test("count-min estimates never under-count and stay within the eps*N bound") {
    val ev = Tables.events(spark, dir)
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val est = ops.Freq.estimates(ev, col("event_type"), exact.keys.toSeq, eps = 0.01)
    exact.foreach { case (k, c) =>
      val e = est(k)
      assert(e >= c, s"$k under-counted: $e < $c")
      assert(e <= c + (0.01 * n).toLong + 1, s"$k over bound: $e vs $c (N=$n)")
    }
  }
}

class SaltCapSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("minhash bucket cap drops degenerate buckets but keeps real dups") {
    val template = "exact same boilerplate content shared by every doc"
    val many = (1L to 30L).map(i => (i, template))
    val dups = Seq((100L, "unique real duplicate pair content here today"),
      (101L, "unique real duplicate pair content here today"))
    val corpus = (many ++ dups).toDF("doc_id", "text")
    val capped = dedup.Dedup.minhashCandidates(corpus, minEstJaccard = 0.3, maxBucketSize = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((100L, 101L)))
    assert(!capped.exists(p => p._1 <= 30L)) // boilerplate bucket dropped
  }
}

class MergeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("upsert: updates replace, inserts append, untouched pass through") {
    val target = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "w")
    val updates = Seq((2L, "B2", 21L), (3L, "c", 30L)).toDF("k", "v", "w")
    val m = ops.Merge.upsert(target, updates, "k").orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(m === Seq((1L, "a", 10L), (2L, "B2", 21L), (3L, "c", 30L)))
  }
}

class SizedSinkSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions.col

  test("sized writes collapse many shuffle partitions into few target-size files") {
    val tmp = graft.TmpDirs.create("sized")
    // a groupBy leaves shuffle.partitions output partitions; the sized
    // sink must not write one file per partition for tiny data
    val tiny = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").count()
    val nFiles = sinks.SizedSink.write(tiny, s"$tmp/out", targetBytes = 8L * 1024 * 1024)
    val written = new java.io.File(s"$tmp/out").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(written === nFiles)
    assert(written <= 4, s"expected few files for tiny data, got $written")
    assert(spark.read.parquet(s"$tmp/out").count() === tiny.count())
  }
}

class ClusteredSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions.{col, input_file_name, max, min}

  test("clustered write produces files with disjoint sorted key ranges") {
    val tmp = graft.TmpDirs.create("clu")
    sinks.Clustered.write(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      s"$tmp/li", Seq("l_orderkey"), numFiles = 4)
    val ranges = spark.read.parquet(s"$tmp/li")
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }
}

class PartitionPruneSpec extends AnyFunSuite {
  import TestSpark._

  test("partitioned write + filtered read shows partition pruning at the scan") {
    val tmp = graft.TmpDirs.create("prune")
    val orders = Tables.orders(spark, dir).withColumn("yr", year(col("o_orderdate")))
    sinks.Refresh.overwrite(orders, s"$tmp/orders", partitionBy = Seq("yr"))
    val filtered = spark.read.parquet(s"$tmp/orders").where(col("yr") === 1997)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("yr"), scan.take(500))
    assert(filtered.count() > 0)
  }
}

/** Randomized (seeded) property-style checks: Spark implementations vs
  * plain-Scala reference implementations over generated inputs.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randText(): String = {
    val alphabet = "abc XYZ 012 .,!?é\t\n"
    (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  test("wordCount matches a plain-Scala reference on 200 random strings") {
    val texts = Seq.fill(200)(randText())
    def refWordCount(s: String): Long =
      s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").count(_.nonEmpty).toLong
    val got = texts.toDF("text")
      .select(graft.text.Text.wordCount(col("text"))).as[Long].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g === refWordCount(t), s"text=${t.take(40)}")
    }
  }

  test("ShingleBlock agrees with the compositional string-shingle pipeline on 200 random strings") {
    val texts = Seq.fill(200)(randText())
    val df = texts.toDF("text").select(
      graft.functions.exprs.shingle_block(col("text"), 3, 3).as("b"),
      array_distinct(graft.text.Text.shingles(col("text"), 3)).as("ss"),
      graft.text.Text.words(col("text")).as("w"))
    df.collect().foreach { r =>
      val nWords = r.getSeq[String](2).length
      if (nWords == 0) {
        assert(r.isNullAt(0)) // no words -> null block
      } else {
        // same DISTINCT shingle count (hash set vs string set)
        assert(r.getStruct(0).getSeq[Long](1).length === r.getSeq[String](1).length)
      }
    }
  }

  test("TopKPerKey equals sort-take on 500 random rows") {
    val rows = Seq.fill(500)((rnd.nextInt(7).toLong, rnd.nextLong(), rnd.nextInt(1000).toLong))
    val df = rows.toDF("k", "uid", "score")
    val got = plans.TopK.perKey(df, Seq("k"), Seq("score" -> true, "uid" -> false), 5)
      .select("k", "uid", "score").as[(Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy(r => (-r._3, r._2)).take(5)
    }.toSet
    assert(got === want)
  }

  test("scd2: closes changed, keeps unchanged, inserts new, preserves history") {
    val target = Seq(
      (1L, "a", 0L, Some(50L)),  // closed history row
      (1L, "b", 50L, None),      // open, will change
      (2L, "x", 0L, None),       // open, unchanged update arrives
      (3L, "y", 0L, None)        // open, no update
    ).toDF("k", "v", "valid_from", "valid_to")
    val updates = Seq(
      (1L, "B2", 100L), (2L, "x", 100L), (9L, "new", 100L)
    ).toDF("k", "v", "effective")
    val out = ops.Merge.scd2(target, updates, "k", Seq("v"))
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (1L, "a", 0L, Some(50L)),   // history untouched
      (1L, "b", 50L, Some(100L)), // closed at effective date
      (1L, "B2", 100L, None),     // new open version
      (2L, "x", 0L, None),        // idempotent: no churn
      (3L, "y", 0L, None),        // untouched
      (9L, "new", 100L, None)))   // insert
  }

  test("scd2 equals a plain-Scala reference model on 300 random rows") {
    val eff = 100L
    val openRows = (0L until 40L).map(k => (k, "v" + rnd.nextInt(4), 10L, None: Option[Long]))
    val closedRows = (0L until 10L).map(k => (k, "old", 0L, Some(10L): Option[Long]))
    val updates = (20L until 60L).map(k => (k, "v" + rnd.nextInt(4), eff))
    val target = (openRows ++ closedRows).toDF("k", "v", "valid_from", "valid_to")
    val got = ops.Merge.scd2(target, updates.toDF("k", "v", "effective"), "k", Seq("v"))
      .as[(Long, String, Long, Option[Long])].collect().toSet
    // reference model
    val openMap = openRows.map(r => r._1 -> r).toMap
    val expect = scala.collection.mutable.Set[(Long, String, Long, Option[Long])]()
    expect ++= closedRows // history passes through
    val updated = updates.map(_._1).toSet
    openRows.foreach { case (k, v, from, _) =>
      updates.find(_._1 == k) match {
        case Some((_, uv, e)) if uv != v =>
          expect += ((k, v, from, Some(e))); expect += ((k, uv, e, None))
        case _ => expect += ((k, v, from, None))
      }
    }
    updates.foreach { case (k, uv, e) =>
      if (!openMap.contains(k)) expect += ((k, uv, e, None))
    }
    assert(got === expect.toSet)
  }

  test("merge.upsert with disjoint keys equals union") {
    val a = Seq.fill(50)((rnd.nextInt(1000).toLong * 2, rnd.nextInt(100).toLong)).distinctBy(_._1)
    val b = Seq.fill(50)((rnd.nextInt(1000).toLong * 2 + 1, rnd.nextInt(100).toLong)).distinctBy(_._1)
    val m = ops.Merge.upsert(a.toDF("k", "v"), b.toDF("k", "v"), "k")
      .as[(Long, Long)].collect().toSet
    assert(m === (a ++ b).toSet)
  }
}

class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bucketized interval join equals the naive BETWEEN join") {
    val rnd = new scala.util.Random(7)
    val l = Seq.fill(200)((rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }
    val r = Seq.fill(400)((rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, i.toLong + 1000L, t) }
    val lDf = l.toDF("k", "lid", "lt")
    val rDf = r.toDF("k", "rid", "rt")
    val got = ops.RangeJoin.within(lDf, rDf, Seq("k"), "lt", "rt", 1L, 500L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (lk, lid, lt) <- l
      (rk, rid, rt) <- r
      if lk == rk && rt >= lt + 1 && rt <= lt + 500
    } yield (lid, rid)).toSet
    assert(got === want)
  }

  test("plans as a hash equi-join, not a nested-loop join") {
    val lDf = spark.range(100).toDF("lt").withColumn("k", col("lt") % 3)
    val rDf = spark.range(100).toDF("rt").withColumn("k", col("rt") % 3)
    val plan = ops.RangeJoin.within(lDf, rDf, Seq("k"), "lt", "rt", 0L, 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }
}

class JdbcLifecycleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.SaveMode

  test("lifecycle-style load into live Derby: TRUNCATE + parallel Append preserves DDL and PK") {
    val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE loads (id BIGINT NOT NULL, name VARCHAR(32), " +
        "CONSTRAINT loads_pk PRIMARY KEY (id))")
      st.execute("INSERT INTO loads VALUES (999, 'stale')")
      // the lifecycle's pre-load TRUNCATE, then the COPY-analog parallel append
      sinks.SqlLifecycle.execute(conn, Seq("TRUNCATE TABLE loads"))
      val df = spark.range(100).toDF("id")
        .withColumn("name", concat(lit("row"), col("id")))
      sinks.JdbcBulkSink.write(df, url, "loads", numPartitions = 4,
        mode = SaveMode.Append)
      val rs = st.executeQuery("SELECT COUNT(*), MIN(id), MAX(id) FROM loads")
      rs.next()
      assert((rs.getLong(1), rs.getLong(2), rs.getLong(3)) === ((100L, 0L, 99L)))
      // table was appended into, not dropped/recreated: PK constraint intact
      val pk = st.executeQuery(
        "SELECT c.CONSTRAINTNAME FROM SYS.SYSCONSTRAINTS c " +
          "JOIN SYS.SYSTABLES t ON c.TABLEID = t.TABLEID " +
          "WHERE t.TABLENAME = 'LOADS' AND c.TYPE = 'P'")
      assert(pk.next() && pk.getString(1) === "LOADS_PK")
    } finally conn.close()
  }

  test("crash mid-append, then lifecycle re-run converges: TRUNCATE+reload idempotency") {
    val url = s"jdbc:derby:memory:graftcrash${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE loads (id BIGINT NOT NULL, name VARCHAR(32), " +
        "CONSTRAINT loads_pk PRIMARY KEY (id))")
      def counts(): (Long, Long) = {
        val rs = st.executeQuery("SELECT COUNT(*), COUNT(DISTINCT id) FROM loads")
        try { rs.next(); (rs.getLong(1), rs.getLong(2)) } finally rs.close()
      }
      val clean = spark.range(100).toDF("id")
        .withColumn("name", concat(lit("row"), col("id")))
      // "kill" one of the 4 writer partitions mid-job: the row id=13 raises
      // while serializing, so its partition's transaction rolls back AFTER
      // other partitions may already have committed — the partial state a
      // real mid-load crash leaves behind (per-partition connections each
      // commit independently, exactly like the real sink at scale)
      val poisoned = spark.range(100).toDF("id")
        .withColumn("name",
          when(col("id") === 13, raise_error(lit("simulated writer crash")))
            .otherwise(concat(lit("row"), col("id"))))
      intercept[Exception] {
        sinks.JdbcBulkSink.write(poisoned, url, "loads", numPartitions = 4,
          mode = org.apache.spark.sql.SaveMode.Append)
      }
      val (partial, _) = counts()
      assert(partial < 100L, s"crashed load must not be complete, saw $partial rows")
      // recovery = re-run the SAME lifecycle (the reference's operational
      // story): pre-load TRUNCATE wipes the partial state, the full append
      // lands exactly once — idempotent under any number of crash/retry loops
      sinks.SqlLifecycle.execute(conn, Seq("TRUNCATE TABLE loads"))
      sinks.JdbcBulkSink.write(clean, url, "loads", numPartitions = 4,
        mode = org.apache.spark.sql.SaveMode.Append)
      assert(counts() === ((100L, 100L)))
      // PK survived the crash + recovery (table never dropped/recreated)
      val pk = st.executeQuery(
        "SELECT c.CONSTRAINTNAME FROM SYS.SYSCONSTRAINTS c " +
          "JOIN SYS.SYSTABLES t ON c.TABLEID = t.TABLEID " +
          "WHERE t.TABLENAME = 'LOADS' AND c.TYPE = 'P'")
      assert(pk.next() && pk.getString(1) === "LOADS_PK")
    } finally conn.close()
  }
}

class KMeansSpec extends AnyFunSuite {
  import TestSpark._

  test("spherical k-means: objective non-decreasing over iterations, deterministic") {
    val emb = Tables.embeddings(spark, dir)
    val objs = (0 to 2).map { it =>
      KMeansObj.objective(emb, graft.ann.KMeans.fit(emb, 8, it))
    }
    assert(objs(1) >= objs(0) - 1e-9, s"iter1 ${objs(1)} < init ${objs(0)}")
    assert(objs(2) >= objs(1) - 1e-9, s"iter2 ${objs(2)} < iter1 ${objs(1)}")
    val a = graft.ann.KMeans.fit(emb, 8, 2).map(_.toSeq).toSeq
    val b = graft.ann.KMeans.fit(emb, 8, 2).map(_.toSeq).toSeq
    assert(a === b)
  }

  test("IvfIndex round-trips centroids; fitted probe returns k rows per query") {
    val emb = Tables.embeddings(spark, dir)
    val tmp = graft.TmpDirs.create("ivf_spec")
    val built = graft.ann.IvfIndex.build(emb, s"$tmp/ix", k = 8, iters = 1)
    val loaded = graft.ann.IvfIndex.load(spark, s"$tmp/ix")
    assert(built.map(_.toSeq).toSeq === loaded.map(_.toSeq).toSeq)
    val r = graft.ann.Ann.ivfTopK(emb, Seq(0L, 1L), 5,
      centroids = Some(loaded.toSeq.map(_.toSeq)))
    val perQuery = r.groupBy("query_id").count().collect()
    assert(perQuery.length === 2 && perQuery.forall(_.getLong(1) === 5L))
  }

  private object KMeansObj {
    def objective(emb: org.apache.spark.sql.DataFrame, c: Array[Array[Double]]): Double =
      graft.ann.KMeans.objective(emb, c)
  }
}

class ChunkingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("chunkByWords: exact multiple, remainder, short, empty and NULL docs") {
    val docs = Seq(
      (1L, "a b c d e f"), // 6 words, window 2 -> 3 chunks
      (2L, "x y z"),       // remainder chunk of 1
      (3L, "solo"),        // single short chunk
      (4L, ""),            // no chunks
      (5L, null.asInstanceOf[String]) // no chunks (no phantom null chunk)
    ).toDF("doc_id", "text")
    val r = text.Chunking.chunkByWords(docs, 2).orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(r === Seq(
      (1L, 0L, "a b", 2L), (1L, 1L, "c d", 2L), (1L, 2L, "e f", 2L),
      (2L, 0L, "x y", 2L), (2L, 1L, "z", 1L),
      (3L, 0L, "solo", 1L)))
  }

  test("packByBudget: running total splits packs at the budget boundary") {
    val docs = Seq(
      (1L, "s", 1000L), (2L, "s", 1000L), (3L, "s", 1000L), // cum 1000,2000,3000
      (4L, "t", 5000L)                                      // oversized doc -> own pack
    ).toDF("doc_id", "source", "nt")
    val r = text.Chunking.packByBudget(docs, col("nt"), 2048)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }
}

class GopherSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("repetitive doc flagged, varied doc kept") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "a genuinely varied sentence with many different interesting words here")
    ).toDF("doc_id", "text")
    val r = text.Gopher.metrics(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("keep") === false) // top_word_frac = 1.0
    assert(r(0).getAs[Long]("top_word_n") === 8L)
    assert(r(0).getAs[Double]("dup_frac") > 0.8)
    assert(r(1).getAs[Boolean]("keep") === true)
    assert(r(1).getAs[Double]("dup_frac") === 0.0)
  }
}

class ContaminationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("doc sharing a 5-gram with the eval set is flagged; unrelated doc is not") {
    val evalSet = Seq((100L, "the secret benchmark question about spark internals")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then the secret benchmark question about spark internals and more"),
      (2L, "completely unrelated text with no overlap whatsoever in any gram")
    ).toDF("doc_id", "text")
    val r = dedup.Contamination.sharedGrams(corpus, evalSet, 5)
      .as[(Long, Long)].collect().toMap
    assert(r.contains(1L) && r(1L) >= 1L)
    assert(!r.contains(2L))
  }
}

class SampleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")

  test("deterministic: identical sample on every run, disjoint strata rates") {
    val take = () => ops.Sample.stratified(df, col("id"), col("s"), Map("a" -> 0.5), 0.1)
      .as[(Long, String)].collect().toSet
    val s1 = take()
    assert(s1 === take())
    val aRate = s1.count(_._2 == "a") / 500.0
    val bRate = s1.count(_._2 == "b") / 500.0
    assert(aRate > 0.4 && aRate < 0.6, s"a rate $aRate")
    assert(bRate > 0.04 && bRate < 0.17, s"b rate $bRate")
  }

  test("rate 1.0 keeps everything, 0.0 keeps nothing") {
    assert(ops.Sample.stratified(df, col("id"), col("s"), Map("a" -> 1.0, "b" -> 1.0)).count() === 1000L)
    assert(ops.Sample.stratified(df, col("id"), col("s"), Map.empty, 0.0).count() === 0L)
  }

  test("quotaPerStratum: exact n per stratum, deterministic membership") {
    val q = ops.Sample.quotaPerStratum(df, col("id"), col("s"), 25)
    val byStratum = q.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum === Map("a" -> 25L, "b" -> 25L))
    val again = ops.Sample.quotaPerStratum(df, col("id"), col("s"), 25)
      .as[(Long, String)].collect().toSet
    assert(again === q.as[(Long, String)].collect().toSet)
  }
}

class VecInt8Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("int8Normalize: unit-norm output scale, zero vector maps to zeros") {
    val df = Seq(
      (1L, Seq(3f, 4f)),       // classic 3-4-5
      (2L, Seq(0f, 0f))
    ).toDF("vec_id", "embedding")
    val r = df.select(col("vec_id"), vec.Vec.int8Normalize(col("embedding")).as("q8"))
      .orderBy("vec_id").collect()
    val v1 = r(0).getSeq[Long](1)
    assert(v1 === Seq(76L, 102L)) // 127*(3,4)/5 rounded
    assert(r(1).getSeq[Long](1) === Seq(0L, 0L))
  }
}

class ScrubSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("normalizeWs collapses whitespace; scrubPii redacts emails and long digit runs") {
    val df = Seq("Mail  me\tat bob.smith+x@example.co.uk\n or call 123456789  now").toDF("text")
    val r = df.select(
      text.Text.normalizeWs(col("text")),
      text.Text.scrubPii(col("text"))).collect()(0)
    assert(r.getString(0) === "mail me at bob.smith+x@example.co.uk or call 123456789 now")
    assert(r.getString(1) === "Mail  me\tat <EMAIL>\n or call <NUM>  now")
  }
}

class ComponentsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("min-label propagation finds components across a chain, triangle, and pair") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("doc_a", "doc_b")
    val labels = dedup.Components.minLabel(edges)
    val got = labels.as[(Long, Long)].collect().toMap
    labels.unpersist()
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }
}

/** Plan-shape regression guard: the §5 scale claims, enforced. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String = {
    val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    p
  }

  test("no query plans a nested-loop or cartesian join, except the tiny-broadcast baselines") {
    // BNLJ is acceptable ONLY where the broadcast side is provably tiny
    // by construction: the scalar-subquery enrichment (1 row) and the
    // brute-force ANN baseline (|queryIds| rows against one corpus
    // scan) — q_hybrid_rrf embeds that same brute-force leg, so it
    // inherits the same (allowed) plan shape; its own fusion join is
    // an equi-join.
    // q_events_kmv_distinct joins two 1-row sketch/exact aggregates for
    // its TOTAL row; q_drift_psi densifies a (sources × bins) metadata
    // grid — both sides are aggregates bounded by construction.
    // ann_recall_eval composes the brute-force truth leg, so it inherits
    // that leg's tiny-broadcast BNLJ; its own truth-vs-approx join is an
    // equi-join on (query_id, vec_id).
    // q_kmv_overlap crossJoins four 1-row sketch/exact aggregates —
    // same bounded-metadata contract as q_events_kmv_distinct's TOTAL.
    val allowedBnlj = Set("q_scalar_sub", "ann_bruteforce_topk", "q_hybrid_rrf",
      "q_events_kmv_distinct", "q_drift_psi", "ann_recall_eval", "q_kmv_overlap",
      "ann_lsh_recall", // same inherited brute-force truth leg as ann_recall_eval
      "q_ref_integrity", // 1x1 crossJoins of per-edge count aggregates
      "vec_hard_negatives", // brute-force scoring leg with the label
                            // inequality as residual: same |queryIds|-row
                            // broadcast contract as ann_bruteforce_topk
      "vec_margin_eval", // same |queryIds|-row broadcast scoring leg
      "text_model_auc", // 1x1 crossJoin of the AUC fold with class totals
      "pipe_source_overlap", // sources×sources metadata pair frame
      "ann_hamming_topk", // same |queryIds|-row broadcast contract as brute force
      "samp_importance", // 1-row median aggregate broadcast back onto the
                         // per-doc scores (bounded by construction)
      "ann_graph_recall", // inherits the brute-force truth leg's tiny
                          // broadcast, like ann_recall_eval / ann_lsh_recall
      "ann_rbo_eval", // same inherited brute-force truth leg (the RBO
                      // compare itself is an equi-join on query_id)
      "pipe_hedge_mix", // inherits text_source_kl's 1-row corpus-total
                        // broadcast (the KL signal it reweights from)
      "text_classifier_kappa", // 1x1 crossJoin of the bounded confusion-
                               // matrix aggregates (N/agree vs pe_num)
      "q_events_changepoint", // types × day-domain dense metadata grid —
                              // same bounded contract as q_drift_psi
      "ann_ivfrq_recall", // inherits the brute-force truth leg's tiny
                          // broadcast, like the other *_recall evals
      "vec_matryoshka_recall", // three brute-force legs + a 3-row dims
                               // fan on the truth frame, all bounded
      "samp_time_split", // 4-row fold manifest × day-domain aggregate —
                         // metadata grid like q_drift_psi
      "q_churn_risk", // 1-row corpus-max-day aggregate broadcast back
      "text_source_kl", // 1-row corpus-total aggregate (N_c) broadcast
      "text_heldout_surprisal", // 1-row N+V smoothing constant broadcast
      "text_vocab_coverage", // 6-row k grid × 1-row vocab totals —
                             // metadata grid like q_drift_psi
      "q_stock_value", // Q11's HAVING-vs-global-scalar: 1-row
                       // (total, n_parts) aggregate broadcast back
      "q_values_benford", // 1-row global-N aggregate onto the 9-digit spine
      "vec_int8_recall", // brute-force truth leg + the same
                         // |queryIds|-row broadcast int8 scoring leg
      "ann_pq_recall", // inherits the brute-force truth leg's tiny
                       // broadcast, like the other *_recall evals
      "ann_lsh_multiprobe_recall", // same inherited brute-force truth leg
                                   // (the multiprobe leg is bucket-equi)
      "ann_ivf_nprobe_sweep", // brute-force truth leg + a 4-row nProbe
                              // spine fan on it — bounded metadata grid
      "q_events_abtest", // 1-row 2x2 contingency fold broadcast onto
                         // the 2-row arms frame
      "ann_mips_topk", // same |queryIds|-row broadcast scoring contract
                       // as ann_bruteforce_topk
      "q_corr_kendall", // ≤550-cell value-grid self-join (non-equi on the
                        // bounded metadata grid) + 1x1 aggregate joins —
                        // same bounded contract as q_drift_psi
      "q_cramers_v", // 1x1 crossJoin of the chi2 fold with the bounded
                     // (n_brands, n_types) dims aggregate
      "text_source_jsd", // 1-row corpus-total aggregate (N_c) broadcast,
                         // same contract as text_source_kl
      "dedup_embed_eval", // bounded 500-vector eval-slice self-join (the
                          // exact all-pairs truth leg; slice by contract)
      "vec_sq_recall", // brute-force truth leg + the same |queryIds|-row
                       // broadcast SQ scoring leg, like vec_int8_recall
      "q_brand_type_mi", // 1x1 crossJoins of the bounded MI/entropy
                         // aggregates, same contract as q_cramers_v
      "q_events_cuped", // 1-row pooled theta aggregate broadcast onto
                        // the 2-row arms frame, like q_events_abtest
      "q_bloom_fpr_eval", // 1x1 crossJoin of the probe fold with the
                          // member-count aggregate, like q_kmv_overlap
      "ann_hamming_recall", // inherits BOTH tiny-broadcast legs it
                            // composes: the brute-force truth and the
                            // hamming |queryIds|-row scoring contract
      "ann_filtered_topk") // its OWN search join is label-equi (the
                           // pre-filter design claim); the BNLJ is the
                           // inherited brute-force leg of the
                           // post-filter-yield readout
    val offenders = SparkEntry.queries.keys.flatMap { name =>
      val p = planOf(name)
      val bad =
        (p.contains("BroadcastNestedLoopJoin") && !allowedBnlj(name)) ||
          p.contains("CartesianProduct")
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"non-equi join plans in: $offenders")
  }

  test("R8 sweep/sequence operators plan only KEYED windows (no global sort)") {
    // a global window's spec starts with the ORDER column (no partition
    // columns): windowspecdefinition(col ASC ...); keyed windows list
    // their partition columns first. The sweeps/sequences below must
    // never fall back to a single-partition global order — that is the
    // 100 TB design claim as an executable regression. (Bounded global
    // windows — zipf's 1000-row fit, vocab_growth's 10-row deciles —
    // are a different, documented contract and are not in this list.)
    val globalSpec = """windowspecdefinition\([a-z_]+#\d+L? (ASC|DESC)""".r
    Seq("q_events_peak_concurrency", "q_events_active_time",
      "q_events_bot_score", "q_orders_cohort_ltv", "q_customer_migration",
      "text_ngram_novelty").foreach { q =>
      val p = planOf(q)
      assert(p.contains("windowspecdefinition"), s"$q lost its window")
      assert(globalSpec.findFirstIn(p).isEmpty,
        s"$q plans a GLOBAL window: ${globalSpec.findFirstIn(p)}")
    }
  }

  test("text operators prune the documents scan to (doc_id, text)") {
    Seq("text_gopher_quality", "dedup_contaminated", "text_chunk_windows", "text_line_dedup").foreach { q =>
      val reads = "ReadSchema: ([^\\n]*)".r.findAllMatchIn(planOf(q)).map(_.group(1)).toSeq
      assert(reads.nonEmpty && reads.forall(_ == "struct<doc_id:bigint,text:string>"),
        s"$q scans: $reads")
    }
  }

  test("sampling reads only its three columns; contamination joins via broadcast") {
    val samp = planOf("samp_stratified")
    assert(samp.contains("struct<doc_id:bigint,lang:string,source:string>"), samp.take(400))
    val cont = planOf("dedup_contaminated")
    assert(cont.contains("BroadcastHashJoin"), cont.take(400))
  }
}

class EnrichStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("stream-static broadcast enrichment equals the batch join") {
    val streamed = streaming.EventsStream.runToMemory(
      spark, streaming.EnrichStream.enrichedCounts(spark, dir), "enrich_out")
    val batch = streaming.EnrichStream.enrichedCountsBatch(spark, dir)
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s === b)
    assert(s.nonEmpty)
  }
}

class CorpusPrepStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming corpus prep (foreachBatch) equals the batch pipeline") {
    val out = graft.TmpDirs.create("prep_out")
    val streamed = streaming.CorpusPrepStream.runToParquet(spark, dir, s"$out/corpus")
    val batch = pipeline.CorpusPrep.clean(Tables.documents(spark, dir))
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    batch.unpersist()
    assert(s === b)
    assert(s.nonEmpty)
  }
}

class DedupStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming dedup collapses a doubled stream back to original counts") {
    val deduped = streaming.EventsStream.runToMemory(
      spark, streaming.DedupStream.dedupEvents(spark, dir), "dedup_out", "append")
    val original = Tables.events(spark, dir).count()
    assert(deduped.count() === original)
    assert(deduped.select("event_id").distinct().count() === original)
  }
}

class LineDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def dedup(df: org.apache.spark.sql.DataFrame) =
    text.LineDedup.dedupSegments(df, 3)

  test("first occurrence survives; later docs keep only novel segments") {
    val docs = Seq(
      (1L, "a b c d e f"),          // chunks: "a b c", "d e f"
      (2L, "a b c x y z"),          // "a b c" is a dup; keeps "x y z"
      (3L, "a b c d e f")           // all segments dup -> drops out
    ).toDF("doc_id", "text")
    val r = dedup(docs).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq === Seq((1L, "a b c d e f", 2L), (2L, "x y z", 1L)))
  }

  test("doubled corpus collapses back to the original's output") {
    val base = Tables.documents(spark, dir).select("doc_id", "text")
    val copies = base.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val single = dedup(base).collect().map(_.toSeq).toSet
    val doubled = dedup(base.union(copies)).collect().map(_.toSeq).toSet
    assert(doubled === single)
    assert(single.nonEmpty)
  }

  test("null and wordless docs produce no output rows") {
    val docs = Seq((1L, "a b c"), (2L, null), (3L, "  ...  "))
      .toDF("doc_id", "text")
    assert(dedup(docs).collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}

/** Scale-stress for the dedup family: a 10k-copy boilerplate key must
  * neither concentrate on one task nor change survivors (VERDICT r3 #7).
  */
class DedupSkewSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val skewed = {
    val boiler = (1L to 10000L).map(i =>
      (i, "license header boilerplate repeated verbatim in every single document of this corpus"))
    val real = Seq(
      (20001L, "unique analytical content about catalyst optimizer rule batches and physical planning"),
      (20002L, "unique analytical content about catalyst optimizer rule batches and physical planning strategies"))
    (boiler ++ real).toDF("doc_id", "text")
  }

  test("minhash bucket cap drops the viral bucket but keeps real near-dups") {
    val result = dedup.Dedup.minhashCandidates(skewed, minEstJaccard = 0.3)
    val pairs = result.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    result.unpersist(blocking = true)
    // 10k identical docs would otherwise emit ~50M candidate pairs; the
    // bucket cap (>1000) drops those buckets entirely
    assert(!pairs.exists(p => p._1 <= 10000L || p._2 <= 10000L))
    assert(pairs === Set((20001L, 20002L)))
  }

  test("line dedup keeps the boilerplate segment exactly once, without a Window") {
    val out = text.LineDedup.dedupSegments(skewed, 5)
    // min-struct winner selection partially aggregates map-side; a
    // row_number Window over the segment text (which must co-locate all
    // 10k copies in one task) must NOT appear in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
    val r = out.collect().map(x => x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    val boilerSurvivors = r.keySet.filter(_ <= 10000L)
    assert(boilerSurvivors === Set(1L)) // docs 2..10000 emptied and dropped
    assert(r(1L)._2 === 3L)             // 12-word boilerplate -> 3 segments, all kept at doc 1
    assert(r(20001L)._2 === 3L)         // first occurrence of the shared prefix
    assert(r(20002L) === ("planning strategies", 1L)) // only its novel tail survives
  }
}

/** The fully-inlined TextShingleMinHash codegen (no per-row virtual call
  * back into the expression object) must be bit-identical to the
  * interpreted nullSafeEval path, and the kernel loop must actually
  * appear in the generated class.
  */
class MinHashCodegenSpec extends AnyFunSuite {
  import TestSpark._

  private def sigFrame = Tables.documents(spark, dir)
    .select(col("doc_id"), graft.functions.exprs.text_minhash_sig(col("text")).as("sig"))

  test("generated code contains the inlined kernel loop, not an eval callback") {
    val gen = org.apache.spark.sql.execution.debug
      .codegenString(sigFrame.queryExecution.executedPlan)
    assert(gen.contains("graftTextShingleMinHash"), "kernel function missing from generated code")
    assert(gen.contains("if (v < mins[p]) mins[p] = v;"), "minhash inner loop body not inlined")
    assert(!gen.contains("nullSafeEval"), "codegen still calls back into the expression object")
  }

  test("codegen and interpreted signatures are bit-identical") {
    def collectSigs() = sigFrame.where(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCodegen = collectSigs()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = collectSigs()
      assert(viaCodegen.nonEmpty)
      assert(viaCodegen === interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}

class JoinStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("stream-stream interval join equals the batch range join") {
    val streamed = streaming.EventsStream.runToMemory(
      spark, streaming.JoinStream.attributionStream(spark, dir), "ss_join_out", mode = "append")
    val batch = streaming.JoinStream.attributionBatch(spark, dir)
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s === b)
    assert(s.nonEmpty)
  }
}

/** Z-order layout: the Morton key must interleave correctly, and the
  * written files must tile BOTH dimensions (each file's per-dimension
  * range much narrower than the global range) — the property that makes
  * row-group min/max skipping work for either predicate, which 1-D
  * range clustering only provides for its leading column.
  */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("interleave_bits32 places a's bits even, b's bits odd") {
    val r = Seq((3L, 0L), (0L, 3L), (5L, 6L), (0xFFFFFFFFL, 0L))
      .toDF("a", "b")
      .select(graft.functions.exprs.zorder_key(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(r(0) === 0x5L)                  // a=0b11 -> even bits 0,2
    assert(r(1) === 0xAL)                  // b=0b11 -> odd bits 1,3
    assert(r(2) === 0x39L) // a=5 (bits 0,2 -> even pos 0,4 = 0x11); b=6 (bits 1,2 -> odd pos 3,5 = 0x28)
    assert(r(3) === 0x5555555555555555L)   // all 32 a-bits -> every even bit
  }

  test("z-ordered files tile both dimensions; 1-D clustering only one") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    val zdir = TmpDirs.create("zspec")
    sinks.Clustered.zorderWrite(li, s"$zdir/z", "l_partkey", "l_suppkey", numFiles = 8)
    sinks.Clustered.write(li, s"$zdir/one", Seq("l_partkey"), numFiles = 8)

    def fileWidths(path: String, c: String): Seq[Double] = {
      val d = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).cast("double").as("w"))
        .collect().map(_.getDouble(1)).toSeq
      assert(d.size >= 4, s"expected several files, got ${d.size}")
      d
    }
    val global = li.agg(
      (max("l_partkey") - min("l_partkey")).cast("double"),
      (max("l_suppkey") - min("l_suppkey")).cast("double")).collect()(0)
    val (gp, gs) = (global.getDouble(0), global.getDouble(1))

    // z-order: BOTH dims tiled — average per-file width well under global
    val zp = fileWidths(s"$zdir/z", "l_partkey")
    val zs = fileWidths(s"$zdir/z", "l_suppkey")
    assert(zp.sum / zp.size < 0.7 * gp, s"partkey not tiled: ${zp.sum / zp.size} vs $gp")
    assert(zs.sum / zs.size < 0.7 * gs, s"suppkey not tiled: ${zs.sum / zs.size} vs $gs")

    // 1-D clustering: leading dim tiled tightly, second dim NOT
    val op = fileWidths(s"$zdir/one", "l_partkey")
    val os = fileWidths(s"$zdir/one", "l_suppkey")
    assert(op.sum / op.size < 0.3 * gp)
    assert(os.sum / os.size > 0.9 * gs, "1-D layout unexpectedly tiled the non-cluster column")
  }
}

class IntradocDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("repeated in-document segments collapse; other docs untouched") {
    val docs = Seq(
      (1L, "a b c a b c a b c"),  // window 3: chunk "a b c" x3 -> once
      (2L, "a b c d e f"),        // two distinct chunks survive
      (3L, null)
    ).toDF("doc_id", "text")
    val r = text.LineDedup.dedupWithinDoc(docs, 3).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq === Seq((1L, "a b c", 1L), (2L, "a b c d e f", 2L)))
  }

  test("the operator is map-side only: no exchange in the plan") {
    val plan = text.LineDedup.dedupWithinDoc(Tables.documents(spark, dir), 40)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }
}

class DomainCapSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("keeps the n highest-wordcount docs per domain, doc_id tiebreak") {
    val docs = Seq(
      (1L, "a", "one two three"), (2L, "a", "one two"), (3L, "a", "one"),
      (4L, "a", "x y"), // ties with doc 2 on wc=2 -> doc 2 wins tiebreak
      (5L, "b", "solo")
    ).toDF("doc_id", "source", "text")
    val r = ops.Sample.domainCap(docs, 2).orderBy("source", "doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(r === Seq((1L, "a"), (2L, "a"), (5L, "b")))
  }

  test("plans through TopKPerKey, not a Window") {
    val plan = ops.Sample.domainCap(Tables.documents(spark, dir), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(400))
    assert(!plan.contains("Window"), plan.take(400))
  }
}

/** Incremental dedup: a batch classified against a persisted history
  * index — exact/near/novel tiers, no history reprocessing, and the
  * build-time bucket cap bounding any future incremental join.
  */
class IncrementalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def classify(history: Seq[(Long, String)], batch: Seq[(Long, String)]) = {
    val tmp = TmpDirs.create("inctest")
    dedup.Incremental.buildIndex(history.toDF("doc_id", "text"), tmp)
    val ix = dedup.Incremental.loadIndex(spark, tmp)
    val out = dedup.Incremental.classify(batch.toDF("doc_id", "text"), ix)
    val r = out.collect().map(x =>
      x.getLong(0) -> (x.getString(1), if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
    out.unpersist(blocking = true)
    r
  }

  test("exact / near / novel tiers with min-history match ids") {
    val history = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "the quick brown fox jumps over the lazy dog near the river bank today"), // same key
      (12L, "completely different historical material about spark catalyst planning " +
        "with adaptive query execution whole stage codegen and predicate pushdown " +
        "explained across many detailed paragraphs of optimizer internals"))
    val batch = Seq(
      (101L, "The quick brown fox jumps over the lazy dog near the river bank today!"), // canon-equal
      (102L, "completely different historical material about spark catalyst planning " +
        "with adaptive query execution whole stage codegen and predicate pushdown " +
        "explained across many detailed paragraphs of optimizer internals appended"), // near
      (103L, "nothing like anything indexed before in this corpus at all whatsoever"))
    val r = classify(history, batch)
    assert(r(101L) === ("exact", 10L)) // min of the two identical history docs
    assert(r(102L)._1 === "near")
    assert(r(102L)._2 === 12L)
    assert(r(103L) === ("novel", -1L))
  }

  test("near-dups of a capped viral bucket come back novel; exact copies still match") {
    val viral = "license header boilerplate repeated verbatim in every single document of this corpus"
    val history = (1L to 1500L).map(i => (i, viral))
    val batch = Seq(
      (9001L, viral),                    // exact tier is cap-independent
      (9002L, viral + " with a tweak")) // near tier: buckets dropped at build
    val r = classify(history, batch)
    assert(r(9001L) === ("exact", 1L))
    assert(r(9002L)._1 === "novel")
  }

  test("classifyAndAbsorb: novel docs from one delta are matched by the next") {
    val tmp = TmpDirs.create("incabs")
    val base = "historical base document about distributed query planning on large clusters of machines"
    val fresh = "a brand new subject entirely devoted to tokenizer vocabularies and byte pair encodings today"
    dedup.Incremental.buildIndex(Seq((10L, base)).toDF("doc_id", "text"), tmp)
    val d1 = dedup.Incremental.classifyAndAbsorb(
      Seq((201L, base), (202L, fresh)).toDF("doc_id", "text"), tmp)
    val r1 = d1.collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    d1.unpersist(blocking = true)
    assert(r1 === Map(201L -> "exact", 202L -> "novel"))
    // 202 was absorbed: the next delta's near-dup and exact copy both hit it
    val d2 = dedup.Incremental.classifyAndAbsorb(
      Seq((301L, fresh), (302L, fresh + " appended")).toDF("doc_id", "text"), tmp)
    val r2 = d2.collect().map(x =>
      x.getLong(0) -> (x.getString(1), if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
    d2.unpersist(blocking = true)
    assert(r2(301L) === ("exact", 202L))
    assert(r2(302L) === ("near", 202L))
  }

  test("compact re-applies the bucket cap across appended segments") {
    val tmp = TmpDirs.create("inccomp")
    val viral = "terms of service boilerplate block attached verbatim to every scraped page in the crawl"
    dedup.Incremental.buildIndex(
      (1L to 600L).map(i => (i, viral)).toDF("doc_id", "text"), tmp)
    dedup.Incremental.appendBatch(
      (601L to 1200L).map(i => (i, viral)).toDF("doc_id", "text"), tmp)
    val probe = Seq((9002L, viral + " with a tweak")).toDF("doc_id", "text")
    // each segment is under the cap, so the near tier still fires...
    val ix1 = dedup.Incremental.loadIndex(spark, tmp)
    val before = dedup.Incremental.classify(probe, ix1)
    assert(before.collect().head.getString(1) === "near")
    before.unpersist(blocking = true)
    // ...until compact sees the bucket's GLOBAL size of 1200 and evicts it
    dedup.Incremental.compact(spark, tmp)
    val ix2 = dedup.Incremental.loadIndex(spark, tmp)
    val after = dedup.Incremental.classify(probe, ix2)
    assert(after.collect().head.getString(1) === "novel")
    after.unpersist(blocking = true)
  }
}

/** Ordered funnel: stage timestamps must strictly follow the previous
  * stage; the plan is windowless aggregates chained on one key.
  */
class FunnelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stage order is enforced per key") {
    val events = Seq(
      // A: completes all three in order
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "purchase", 30L),
      // B: view BEFORE signup only -> stuck at stage 1
      (2L, "view", 5L), (2L, "signup", 10L),
      // C: purchase precedes view -> purchase must not count (stage 2)
      (3L, "signup", 10L), (3L, "purchase", 15L), (3L, "view", 20L),
      // D: never signs up -> absent
      (4L, "view", 10L), (4L, "purchase", 20L))
      .toDF("user_id", "event_type", "ts")
    val out = ops.Funnel.ordered(
      events, "user_id", $"event_type", $"ts", Seq("signup", "view", "purchase"))
    val r = out.collect().map(x => x.getLong(0) -> (
      x.getLong(x.length - 1),
      Seq(1, 2, 3).map(i => if (x.isNullAt(i)) -1L else x.getLong(i)))).toMap
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(r(1L) === (3L, Seq(10L, 20L, 30L)))
    assert(r(2L) === (1L, Seq(10L, -1L, -1L)))
    assert(r(3L) === (2L, Seq(10L, 20L, -1L)))
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("maxGap bounds each transition; a later event can still convert inside its window") {
    val events = Seq(
      // A: view 90 ticks after signup -> outside gap 50, stuck at 1;
      // the plain funnel would credit it
      (1L, "signup", 10L), (1L, "view", 100L), (1L, "purchase", 120L),
      // B: each hop within 50 -> full conversion
      (2L, "signup", 10L), (2L, "view", 40L), (2L, "purchase", 80L),
      // C: FIRST view misses the window but purchase lands within 50 of
      // the view that was reached... no view in window -> stage 1 even
      // though a purchase exists
      (3L, "signup", 10L), (3L, "view", 200L), (3L, "purchase", 210L))
      .toDF("user_id", "event_type", "ts")
    val out = ops.Funnel.ordered(
      events, "user_id", $"event_type", $"ts",
      Seq("signup", "view", "purchase"), maxGap = Some(50L))
    val r = out.collect().map(x => x.getLong(0) -> x.getLong(x.length - 1)).toMap
    assert(r === Map(1L -> 1L, 2L -> 3L, 3L -> 1L))
    val plain = ops.Funnel.ordered(
      events, "user_id", $"event_type", $"ts", Seq("signup", "view", "purchase"))
    assert(plain.collect().map(x => x.getLong(0) -> x.getLong(x.length - 1)).toMap
      === Map(1L -> 3L, 2L -> 3L, 3L -> 3L))
  }
}

/** Salted join: row-identical to the plain join while the physical join
  * key carries the salt (hot fact keys spread across reducers).
  */
class SaltedJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("equals the plain join; join keys include the salt") {
    val fact = (1L to 2000L).map(i => (i, if (i % 10 == 0) 2L else 1L))
      .toDF("row_id", "k") // hot key 1 holds 90% of rows
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("k", "name")
    val salted = ops.Salt.joinSkewed(fact, dim, Seq("k"), $"row_id", buckets = 8)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() === 2000L)
    assert(
      salted.select("k", "row_id", "name").except(plain.select("k", "row_id", "name")).count() === 0L)
    assert(plain.select("k", "row_id", "name").except(salted.select("k", "row_id", "name")).count() === 0L)
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
  }
}

/** Survivorship: canonical doc per near-dup cluster by (quality desc,
  * doc_id asc), via a partially-aggregatable min(struct) — no Window.
  */
class SurvivorsSpec extends AnyFunSuite {
  import TestSpark._

  test("flagship query picks windowless argmax per cluster") {
    val out = SparkEntry.queries("dedup_survivors")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every survivor belongs to its own cluster's doc set and cluster
    // sizes sum to the doc count with a non-null quality basis
    assert(rows.map(_.getLong(1)).sum === 500L)
    val agg = out.queryExecution.executedPlan.toString
    assert(!agg.contains("Window"), agg.take(300))
    spark.catalog.clearCache()
  }
}

/** BM25-shaped lexical top-k: corpus stats collapse to driver-side
  * literals (index metadata), so the scoring plan is a pure map over
  * the corpus with top-k as TakeOrdered — no join, no window, no
  * exchange of any kind.
  */
class Bm25Spec extends AnyFunSuite {
  import TestSpark._

  test("scoring plan is map-only + TakeOrdered") {
    val out = SparkEntry.queries("text_bm25_topk")(spark, "/root/testdata/sf0.001")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(300))
    assert(!plan.contains("Window"))
    assert(!plan.contains("Join"), plan.take(600))
    assert(!plan.contains("Exchange"), plan.take(600))
    assert(out.count() > 0)
    spark.catalog.clearCache()
  }
}

/** Token-budget mixing: greedy doc_id-ordered admission per source
  * until the source's budget is spent, computed through the two-level
  * (bucketed) prefix sum so no window partition exceeds the bucket.
  */
class TokenMixSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("admission equals the naive single-window prefix sum") {
    // tokens chosen so budgets cut mid-bucket and across buckets
    val docs = Seq(
      ("a", 1L, 4L), ("a", 3L, 4L), ("a", 5L, 4L), ("a", 7L, 4L),
      ("b", 2L, 10L), ("b", 4L, 10L), ("b", 6L, 10L))
      .toDF("source", "doc_id", "toks")
    // budgets: a = 10 (admits 4+4, third doc starts at 8 < 10 -> 3 docs),
    // b = 10 (first starts at 0, second at 10 -> 1 doc)
    val out = ops.Sample.tokenMix(
      docs, "source", "doc_id", $"toks", Map("a" -> 10.0, "b" -> 10.0),
      bucketSize = 2L) // force multi-bucket paths
    val r = out.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(3))).toSet
    assert(r === Set(("a", 1L, 0L), ("a", 3L, 4L), ("a", 5L, 8L), ("b", 2L, 0L)))
  }
}

/** CDC changelog apply: highest sequence wins per key, a winning delete
  * removes the key, winner selection is windowless.
  */
class CdcApplySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("latest op wins; winning delete removes the key") {
    val log = Seq(
      (1L, 10L, "U", "a"), (1L, 20L, "U", "b"),            // updates: latest payload wins
      (2L, 10L, "U", "x"), (2L, 30L, "D", "-"),            // delete last -> gone
      (3L, 40L, "D", "-"), (3L, 50L, "U", "y"),            // re-insert after delete -> alive
      (4L, 5L, "U", "z"))                                  // single insert
      .toDF("k", "seq", "op", "v")
    val out = ops.Merge.cdcApply(log, "k", "seq", "op", Seq("v"))
    val r = out.collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    assert(r === Map(1L -> (20L, "b"), 3L -> (50L, "y"), 4L -> (5L, "z")))
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }
}

/** Streaming ingest dedup: micro-batches classified against the
  * persisted index, novel docs absorbed so later batches (and later
  * runs) dedup against them — state lives in the index table, not the
  * stream state store.
  */
class IncrementalStreamSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("streamed classify-then-absorb grows the persisted index") {
    val ixDir = TmpDirs.create("incstix")
    val base = "historical base document about distributed query planning on large clusters of machines"
    val fresh = "a brand new subject entirely devoted to tokenizer vocabularies and byte pair encodings today"
    dedup.Incremental.buildIndex(Seq((10L, base)).toDF("doc_id", "text"), ixDir)

    val srcDir = TmpDirs.create("incstsrc")
    Seq((201L, base), (202L, fresh)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val src = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(srcDir)
    val out = streaming.IncrementalStream.runToParquet(
      spark, src, ixDir, TmpDirs.create("incstout"))
    val r = out.collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r === Map(201L -> "exact", 202L -> "novel"))

    // the stream's novel doc is now in the index: a batch probe sees it
    val probe = dedup.Incremental.classify(
      Seq((301L, fresh + " appended")).toDF("doc_id", "text"),
      dedup.Incremental.loadIndex(spark, ixDir))
    val p = probe.collect().head
    assert((p.getString(1), p.getLong(2)) === ("near", 202L))
    probe.unpersist(blocking = true)
  }

  test("checkpointed restart classifies each file exactly once") {
    val ixDir = TmpDirs.create("incrsix")
    val srcDir = TmpDirs.create("incrssrc")
    val outDir = TmpDirs.create("incrsout")
    val ck = TmpDirs.create("incrsck")
    val base = "historical base document about distributed query planning on large clusters of machines"
    val fresh = "a brand new subject entirely devoted to tokenizer vocabularies and byte pair encodings today"
    dedup.Incremental.buildIndex(Seq((10L, base)).toDF("doc_id", "text"), ixDir)
    def drain(): Map[Long, String] = {
      val src = spark.readStream.schema("doc_id LONG, text STRING").parquet(srcDir)
      streaming.IncrementalStream.runToParquet(spark, src, ixDir, outDir, checkpointDir = ck)
        .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    }
    Seq((201L, fresh)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    assert(drain() === Map(201L -> "novel"))
    // restart with nothing new: offsets in the checkpoint — no re-read,
    // so 201 is NOT re-classified (a rerun without the checkpoint would
    // now call it exact against its own absorbed copy)
    assert(drain() === Map(201L -> "novel"))
    // a new file arrives: only IT is processed; near-match proves the
    // first run's absorb survived the restart
    Seq((301L, fresh + " appended")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val r3 = drain()
    assert(r3 === Map(201L -> "novel", 301L -> "near"))
  }
}

/** Data-quality expectations: planted violations are counted exactly,
  * and all row+unique checks over one table share a single scan.
  */
class ExpectSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("row, uniqueness, and referential rules count planted violations") {
    val t = Seq(
      (1L, 10.0), (2L, -5.0), (2L, 3.0), (3L, -1.0))               // dup key 2; two negatives
      .toDF("k", "v")
    val dim = Seq(1L, 2L).toDF("pk")                               // k=3 is an orphan
    val rep = ops.Expect.suite(
      ops.Expect.table(t,
        Seq(ops.Expect.RowRule("v_nonneg", $"v" < 0)),
        Seq(ops.Expect.UniqueRule("k_unique", Seq("k")))),
      ops.Expect.references("k_in_dim", t, "k", dim, "pk"))
    val r = rep.collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r === Map(
      "v_nonneg" -> ((4L, 2L, false)),
      "k_unique" -> ((4L, 1L, false)),
      "k_in_dim" -> ((4L, 1L, false))))
  }

  test("a NULL key component counts as a uniqueness violation") {
    val t = Seq(Some(1L), None, Some(2L)).toDF("k")
    val r = ops.Expect.table(t, Nil, Seq(ops.Expect.UniqueRule("k_unique", Seq("k"))))
      .collect().head
    assert((r.getLong(2), r.getBoolean(3)) === (1L, false))
  }

  test("all checks over one table plan exactly one scan of it") {
    val plan = ops.Expect.table(
      Tables.orders(spark, dir),
      Seq(
        ops.Expect.RowRule("a", col("o_totalprice") < 0),
        ops.Expect.RowRule("b", col("o_orderdate").isNull)),
      Seq(ops.Expect.UniqueRule("c", Seq("o_orderkey"))))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size === 1, plan.take(800))
  }
}

/** Incremental aggregate maintenance: folding deltas into state in any
  * batching equals the one-shot snapshot over all rows.
  */
class IncrAggSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("merge of chained deltas equals full snapshot, including delta-only keys") {
    val all = Seq(
      ("a", 1L), ("a", 5L), ("a", 3L),   // split across state + deltas
      ("b", 7L),                          // arrives only in the last delta
      ("c", 2L), ("c", 9L))               // split across the two deltas
      .toDF("k", "v")
    val keys = Seq("k")
    val state0 = ops.IncrAgg.snapshot(all.where($"v" <= 1), keys, "v")
    val state1 = ops.IncrAgg.merge(state0, all.where($"v" > 1 && $"v" <= 5), keys, "v")
    val state2 = ops.IncrAgg.merge(state1, all.where($"v" > 5), keys, "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(rows(state2) === rows(ops.IncrAgg.snapshot(all, keys, "v")))
    assert(rows(state2)("c") === ((2L, 11L, 2L, 9L)))
  }
}

/** Bloom-prefiltered join: row-identical to the plain join, the
  * prefilter actually removes non-matching fact rows map-side, and the
  * false-positive rate honors the requested fpp.
  */
class BloomJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
  private def dim = Tables.orders(spark, dir)
    .where(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"))

  test("bloom join is row-identical to the plain join; might_contain filters before the join") {
    val bloomed = ops.BloomJoin.prefilterInner(li, dim, "l_orderkey", "o_orderkey", 1 << 14)
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
    val b = bloomed.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val p = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(b === p)
    assert(b.nonEmpty)
    assert(bloomed.queryExecution.executedPlan.toString.contains("might_contain"))
  }

  test("prefilter keeps all matches and few false positives") {
    val bloom = ops.BloomJoin.keyBloom(dim, "o_orderkey", 1 << 14, 0.01).get
    val kept = li.where(ops.BloomJoin.mightContain(bloom, col("l_orderkey"))).count()
    val matching = li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val total = li.count()
    assert(kept >= matching, "a bloom filter can never drop a true match")
    assert(kept <= matching + (0.05 * total).toLong, s"fpp blown: kept=$kept matching=$matching total=$total")
  }

  test("empty build side yields an empty inner join") {
    assert(ops.BloomJoin.prefilterInner(li, dim.where(lit(false)), "l_orderkey", "o_orderkey").count() === 0L)
  }
}

/** Hashed linear quality classifier: deterministic weights, map-side
  * (exchange-free) scoring, robust degenerate-input behavior. Bit-level
  * cross-engine parity is the DuckHash oracle's job.
  */
class QualityModelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("scoring plans no exchange and handles empty/punct/unicode text") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, ""),                      // empty -> 0 tokens, score 0, drop
      (3L, "!!! ??? ..."),           // punctuation-only canon -> empty
      (4L, "naïve café über"))       // non-ascii strips to ascii word runs
      .toDF("doc_id", "text")
    val out = text.QualityModel.scored(docs, text.QualityModel.weightsMicro())
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val r = out.collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r(2L) === ((0L, 0L, false)))
    assert(r(3L) === ((0L, 0L, false)))
    assert(r(1L)._1 === 4L)
    assert(r(4L)._1 > 0L) // "na ve caf ber" style word runs survive
  }

  test("weights are deterministic and bounded") {
    val w = text.QualityModel.weightsMicro()
    assert(w.toSeq === text.QualityModel.weightsMicro().toSeq)
    assert(w.forall(x => x >= -1000L && x <= 1000L))
    assert(w.distinct.length > 16) // not degenerate
  }

  test("fitted weights: deterministic, bounded, beat the seeded baseline on the label") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val fitted = text.QualityModel.fitWeightsMicro(docs)
    assert(fitted.toSeq === text.QualityModel.fitWeightsMicro(docs).toSeq)
    assert(fitted.forall(x => x >= -2000000L && x <= 2000000L))
    assert(fitted.count(_ != 0L) > 16) // most buckets saw tokens
    val labels = text.Gopher.metrics(docs).select(col("doc_id"), col("keep").as("label"))
    def correct(w: Array[Long]): Long =
      text.QualityModel.scored(docs, w).join(labels, "doc_id")
        .where(col("label") === (col("score_micro") > 0L)).count()
    assert(correct(fitted) >= correct(text.QualityModel.weightsMicro()))
  }
}

/** Key-skew diagnostic: exact counts on a planted hot key, one scan,
  * no Window operator (hottest key via partially-aggregatable argmin).
  */
class SkewReportSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("hot key, counts, and permille ratio are exact; no Window; one scan per frame") {
    val rows = (1L to 10L).map(i => (i, s"u$i")) ++ Seq.fill(90)((99L, "hot"))
    val df = rows.toDF("k", "tag")
    val out = ops.Skew.keySkew(df, Seq("k"))
    val r = out.collect().head
    // 100 rows, 11 distinct keys, hottest 90 -> 90 * 11 * 1000 / 100 = 9900
    assert((r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"), r.getAs[Long]("max_cnt")) === ((100L, 11L, 90L)))
    assert(r.getAs[String]("hot_key") === "99")
    assert(r.getAs[Long]("skew_x1000") === 9900L)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("count ties break to the lexicographically smallest key") {
    val df = Seq((1L, 0), (1L, 0), (2L, 0), (2L, 0)).toDF("k", "x")
    assert(ops.Skew.keySkew(df, Seq("k")).collect().head.getAs[String]("hot_key") === "1")
  }
}

/** Integer fixed-point PageRank: hand-computed small graph, dangling
  * and source-only node behavior, determinism.
  */
class PageRankSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("one iteration on a 3-node path matches hand-computed fixed-point values") {
    // 1 -> 2, 1 -> 3, 2 -> 3 ; node 3 dangling (absorbs), node 1 no in-edges
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val scale = 1000000000000L
    val r0 = scale / 3            // 333333333333
    val base = 15L * r0 / 100L    // 49999999999
    val out = graph.PageRank.run(edges, iters = 1, scale).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = r0 / 2               // node 1 contributes rank/outdeg=2 to node 2
    val c3 = r0 / 2 + r0          // from node 1 (deg 2) and node 2 (deg 1)
    assert(out === Map(
      1L -> base,
      2L -> (base + 85L * c2 / 100L),
      3L -> (base + 85L * c3 / 100L)))
  }

  test("three iterations are deterministic and keep total mass bounded by scale") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L)).toDF("src", "dst")
    val a = graph.PageRank.run(edges, iters = 3).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = graph.PageRank.run(edges, iters = 3).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    val total = a.map(_._2).sum
    assert(total > 0L && total <= 1000000000000L, s"mass $total")
  }
}

/** PQ/ADC ANN: code structure, determinism, and the bounded-heap plan.
  * End-to-end score correctness is the DuckDB oracle's job.
  */
class PqSpec extends AnyFunSuite {
  import TestSpark._

  test("codes are m ints in [0, kCent); encoding is deterministic") {
    val emb = Tables.embeddings(spark, dir)
    val cb = ann.Pq.sampledCodebook(emb)
    assert(cb.length === ann.Pq.m && cb.forall(_.length === ann.Pq.kCent))
    val coded = emb.select(org.apache.spark.sql.functions.col("vec_id"),
      ann.Pq.codes(org.apache.spark.sql.functions.col("embedding"), cb).as("codes"))
    val rows = coded.collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2.length === ann.Pq.m))
    assert(rows.forall(_._2.forall(c => c >= 0 && c < ann.Pq.kCent)))
    val again = coded.collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(rows.toMap === again.toMap)
    // a codebook sample vector's own subspace distance to itself is 0 -> codes itself
    val self = rows.toMap.apply(0L)
    val expectedSelf = (0 until ann.Pq.m).map(_ => 0)
    assert(self === expectedSelf)
  }

  test("adcTopK excludes self, returns k per query, reduces via TopKPerKey") {
    val out = ann.Pq.adcTopK(Tables.embeddings(spark, dir), Seq(0L, 1L), 5)
    assert(out.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val r = out.collect()
    assert(r.length === 10)
    assert(r.forall(x => x.getLong(0) != x.getLong(1)))
    assert(r.groupBy(_.getLong(0)).forall(_._2.map(_.getLong(3)).sorted.toSeq == (1L to 5L)))
  }

  test("persisted PQ index: codebook round-trips bit-exact, probes match fresh encode") {
    val emb = Tables.embeddings(spark, dir)
    val tmp = graft.TmpDirs.create("pq_ix")
    val built = ann.Pq.Index.build(emb, s"$tmp/ix")
    val loaded = ann.Pq.Index.loadCodebook(spark, s"$tmp/ix")
    assert(built.flatten.flatten.toSeq === loaded.flatten.flatten.toSeq)
    val qs = emb.where(org.apache.spark.sql.functions.col("vec_id").isin(0L, 1L))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val fromIndex = ann.Pq.Index.topK(spark, s"$tmp/ix", qs, 5)
      .collect().map(_.toSeq).toSet
    val fresh = ann.Pq.adcTopK(emb, Seq(0L, 1L), 5).collect().map(_.toSeq).toSet
    assert(fromIndex === fresh)
  }

  test("chunked query scoring is identical to unchunked (fanout bound)") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir)
    val cb = ann.Pq.sampledCodebook(emb)
    val coded = emb.select(col("vec_id"), ann.Pq.codes(col("embedding"), cb).as("codes"))
      .persist()
    // a few hundred queries: far beyond the chunk, with a ragged tail
    val qs = emb.where(col("vec_id") < 210).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    assert(qs.length === 210)
    val unchunked = ann.Pq.scoreCodes(coded, cb, qs, 5, queryChunk = qs.length)
      .collect().map(_.toSeq).toSet
    val chunked = ann.Pq.scoreCodes(coded, cb, qs, 5, queryChunk = 17)
      .collect().map(_.toSeq).toSet
    assert(chunked === unchunked)
    assert(chunked.map(_.head).size === 210) // every query answered
    coded.unpersist(blocking = true)
    ()
  }

  test("fitted codebook beats the sampled baseline on quantization error") {
    val emb = Tables.embeddings(spark, dir)
    val fitted = ann.Pq.fittedCodebook(emb)
    val sampled = ann.Pq.sampledCodebook(emb)
    // fit is deterministic: a second fit is bit-identical (index rebuilds must be)
    val again = ann.Pq.fittedCodebook(emb)
    assert(fitted.flatten.flatten.toSeq === again.flatten.flatten.toSeq)
    val vecs = emb.select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    def err(cb: Array[Array[Array[Double]]]): Double =
      vecs.map { v =>
        (0 until ann.Pq.m).map { s =>
          val sub = v.slice(s * ann.Pq.dsub, (s + 1) * ann.Pq.dsub)
          cb(s).map(c => sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum).min
        }.sum
      }.sum
    assert(err(fitted) < err(sampled))
  }
}

/** Streaming materialized view: micro-batched state folding equals the
  * one-shot batch aggregate regardless of batch boundaries.
  */
class IncrAggStreamSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("streamed per-key state equals the batch snapshot over all rows") {
    val srcDir = TmpDirs.create("incagsrc")
    val stateDir = TmpDirs.create("incagstate") + "/state"
    // two files -> two micro-batches (maxFilesPerTrigger=1)
    Seq(("a", 1L), ("b", 7L), ("a", 5L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq(("a", 3L), ("c", 2L), ("c", 9L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val src = spark.readStream.schema("k STRING, v LONG")
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val state = streaming.IncrAggStream.runToState(spark, src, Seq("k"), "v", stateDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val batch = ops.IncrAgg.snapshot(spark.read.parquet(srcDir), Seq("k"), "v")
    assert(rows(state) === rows(batch))
    assert(rows(state)("a") === ((3L, 9L, 1L, 5L)))
  }

  test("kill between state write and commit: restart converges exactly-once") {
    val srcDir = TmpDirs.create("incagcrsrc")
    val stateDir = TmpDirs.create("incagcrstate") + "/state"
    val ck = TmpDirs.create("incagcrck")
    Seq(("a", 1L), ("b", 7L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    def src = spark.readStream.schema("k STRING, v LONG")
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    // KILL the first run mid-batch: after the version dir is written,
    // before the commit pointer flips — the at-least-once replay window
    // where a naive fold would double-count the batch on restart
    intercept[Exception] {
      streaming.IncrAggStream.runToState(spark, src, Seq("k"), "v", stateDir,
        checkpointDir = ck, onBeforeCommit = () => throw new RuntimeException("simulated kill"))
    }
    // the crash left an uncommitted version dir and no committed state
    assert(intercept[IllegalStateException] {
      streaming.IncrAggStream.readState(spark, stateDir)
    }.getMessage.contains("no committed state"))
    // a second file lands while the job is down
    Seq(("a", 3L), ("c", 2L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    // restart from the same checkpoint: batch 0 REPLAYS (it never
    // committed), batch 1 is new — every row folds exactly once
    val state = streaming.IncrAggStream.runToState(
      spark, src, Seq("k"), "v", stateDir, checkpointDir = ck)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val batch = ops.IncrAgg.snapshot(spark.read.parquet(srcDir), Seq("k"), "v")
    assert(rows(state) === rows(batch))
    assert(rows(state)("a") === ((2L, 4L, 1L, 3L))) // folded once, not twice
    // a replay of an ALREADY-committed batchId is a no-op (idempotence)
    streaming.IncrAggStream.applyBatch(
      spark, Seq(("a", 99L)).toDF("k", "v"), 0L, Seq("k"), "v", stateDir)
    assert(rows(streaming.IncrAggStream.readState(spark, stateDir)) === rows(batch))
  }
}

/** Linear attribution: hand-computed shares, lookback exclusion, and
  * the single-shuffle two-window plan.
  */
class AttributionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("conversion value splits across in-window touches; stale touches get zero") {
    val L = 100L
    // user 1: touches at 10, 50; purchase(90) value 1000 -> 500 each;
    //         touch at 500 is outside every conversion window -> 0
    // user 2: purchase(80) with no touches -> unattributed (no touch rows)
    val ev = Seq(
      (1L, 10L, "click", 0.0), (1L, 50L, "view", 0.0), (1L, 90L, "purchase", 10.0),
      (1L, 500L, "click", 0.0),
      (2L, 80L, "purchase", 7.0))
      .toDF("user_id", "ts_ns", "event_type", "value")
    val out = ops.Attribution.linear(ev, Seq("click", "view"), "purchase", L,
      round(col("value") * 100, 0).cast("long"))
    val r = out.collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(3)).toMap
    assert(r === Map((1L, 10L) -> 500L, (1L, 50L) -> 500L, (1L, 500L) -> 0L))
  }

  test("odd cents truncate per share; two range windows share one exchange") {
    val out = ops.Attribution.linear(
      Seq((1L, 1L, "click", 0.0), (1L, 2L, "click", 0.0), (1L, 3L, "purchase", 0.05))
        .toDF("user_id", "ts_ns", "event_type", "value"),
      Seq("click"), "purchase", 100L, round(col("value") * 100, 0).cast("long"))
    // plan string BEFORE execution: a finalized AQE plan prints both
    // Final and Initial trees, double-counting every node
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(out.queryExecution.executedPlan.toString).size
    assert(exchanges === 1, s"expected one shuffle, got $exchanges")
    assert(out.collect().map(_.getLong(3)).toSeq === Seq(2L, 2L)) // 5 div 2
  }
}

/** Blocked fuzzy match: finds mangled names inside the block, never
  * pairs across blocks, and drops degenerate (viral) blocks.
  */
class FuzzySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("mangled name matches its original within the block at dist 1") {
    val ref = Seq((1L, "Customer#000000014"), (2L, "Customer#000000914")).toDF("id", "name")
    val probe = Seq((10L, "Customer#00000001X")).toDF("pid", "pname")
    val out = ops.Fuzzy.blockedMatch(probe, "pid", "pname", ref, "id", "name", 10, 8, 1)
    val r = out.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // id 2 is in a different block (digit prefix 00000091) -> never compared
    assert(r.toSeq === Seq((10L, 1L, 1L)))
  }

  test("a block larger than the cap is dropped entirely") {
    val ref = (1L to 50L).map(i => (i, "AAAAAAAAAAAA")).toDF("id", "name")
    val probe = Seq((1L, "AAAAAAAAAAAB")).toDF("pid", "pname")
    val kept = ops.Fuzzy.blockedMatch(probe, "pid", "pname", ref, "id", "name", 1, 8, 2, blockCap = 10)
    assert(kept.count() === 0L)
    val uncapped = ops.Fuzzy.blockedMatch(probe, "pid", "pname", ref, "id", "name", 1, 8, 2, blockCap = 100)
    assert(uncapped.count() === 50L)
  }
}

/** Prefix-filter set-similarity join: exact-threshold Jaccard pairs via
  * rarest-first prefix blocking — finds dups/near-dups, never crosses
  * unrelated docs, and caps degenerate prefix-token buckets.
  */
class SetSimSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"), // exact dup: jaccard 1
    (3L, "alpha beta gamma delta epsilon eta"), // 5/7 = 714 permille
    (4L, "totally unrelated words about spark plans")
  ).toDF("doc_id", "text")

  test("exact and near dup found with exact permille; unrelated isolated") {
    val r = dedup.SetSim.prefixJoin(corpus, tX1000 = 600)
      .select("doc_a", "doc_b", "jacc_x1000").as[(Long, Long, Long)]
      .collect().toSet
    assert(r.contains((1L, 2L, 1000L)))
    assert(r.contains((1L, 3L, 714L)))
    assert(r.contains((2L, 3L, 714L)))
    assert(!r.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("pairs below the threshold are excluded by integer cross-multiply") {
    // jaccard 5/7 = 0.714...: kept at t=0.714, dropped at t=0.715
    val at = dedup.SetSim.prefixJoin(corpus, tX1000 = 714)
      .where(col("doc_a") === 1L && col("doc_b") === 3L).count()
    val above = dedup.SetSim.prefixJoin(corpus, tX1000 = 715)
      .where(col("doc_a") === 1L && col("doc_b") === 3L).count()
    assert(at === 1L && above === 0L)
  }

  test("viral tokens (df over the cap) leave the similarity universe") {
    val viral = (1L to 40L).map(i => (i, "boilerplate header")).toDF("doc_id", "text")
    val capped = dedup.SetSim.prefixJoin(viral, tX1000 = 600, maxTokenDf = 10)
    assert(capped.count() === 0L)
    val uncapped = dedup.SetSim.prefixJoin(viral, tX1000 = 600, maxTokenDf = 100)
    assert(uncapped.count() === (40L * 39L) / 2L)
  }
}

/** Degree-ordered triangle counting on hand graphs. */
class TrianglesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("one triangle plus a dangling edge counts each member once") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = graph.Triangles.perNode(edges).as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // node 4 in no triangle
  }

  test("two triangles sharing an edge count their shared nodes twice") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val r = graph.Triangles.perNode(edges).as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}

/** One-pass multi-threshold confusion matrix with integer permille. */
class ModelEvalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val scored = Seq(
    (10L, true), (-5L, false), (20L, false), (0L, true)
  ).toDF("score", "label")

  test("confusion cells and permille at threshold 0") {
    val r = text.ModelEval.confusion(scored, "score", "label", Seq(0L)).collect()(0)
    // pred = score > 0: tp=1 (10,T), fp=1 (20,F), fn=1 (0,T), tn=1 (-5,F)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) === ((1L, 1L, 1L, 1L)))
    assert((r.getLong(5), r.getLong(6)) === ((500L, 500L)))
  }

  test("all thresholds come from one aggregate; empty cells zero-guard") {
    val out = text.ModelEval.confusion(scored, "score", "label", Seq(-100L, 100L))
      .orderBy("threshold").collect()
    // t=-100: everything predicted positive -> fn=tn=0, recall 1000
    assert((out(0).getLong(1), out(0).getLong(4), out(0).getLong(6)) === ((2L, 0L, 1000L)))
    // t=100: nothing predicted positive -> tp=fp=0, precision zero-guarded
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getLong(5)) === ((0L, 0L, 0L)))
  }
}

/** Histogram-walk exact median/MAD anomaly thresholds. */
class AnomalySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("hand-computed median, MAD, and outlier count") {
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L))
      .toDF("g", "v")
    val r = ops.Anomaly.madThresholds(rows, "g", "v", devX1000 = 3000L).collect()(0)
    // sorted [1,2,3,4,100]: lower median 3; |v-3| sorted [0,1,1,2,97]: MAD 1
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) === ((5L, 3L, 1L, 1L)))
  }

  test("even group size takes the lower median; zero MAD guard flags any deviation") {
    val rows = Seq(("b", 5L), ("b", 5L), ("b", 5L), ("b", 9L)).toDF("g", "v")
    val r = ops.Anomaly.madThresholds(rows, "g", "v", devX1000 = 3000L).collect()(0)
    // sorted [5,5,5,9]: lower median 5; deviations [0,0,0,4]: MAD 0 ->
    // guard max(mad,1): outlier iff |v-5| > 3 -> the single 9
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) === ((4L, 5L, 0L, 1L)))
  }

  test("binWidth = 1 is the identity on integer domains") {
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L)).toDF("g", "v")
    val a = ops.Anomaly.madThresholds(rows, "g", "v", 3000L).collect()(0)
    val b = ops.Anomaly.madThresholds(rows, "g", "v", 3000L, binWidth = 1L).collect()(0)
    assert(a.toSeq === b.toSeq)
  }
}

/** The cardinality contract: binWidth pre-binning bounds the histogram-
  * walk window partitions by the binned DOMAIN even when a group has
  * ~1e6 distinct raw values.
  */
class AnomalyBinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("1e6-distinct-value group: binned histogram stays domain-bounded, stats exact on bins") {
    // one group, 1,000,000 distinct values 0..999999 (a continuous metric in micros)
    val rows = spark.range(1000000L).select(lit("hot").as("g"), col("id").as("v"))
    val bw = 1000L
    val out = ops.Anomaly.madThresholds(rows, "g", "v", devX1000 = 3000L, binWidth = bw)
    val r = out.collect()(0)
    // binned values are 0, 1000, ..., 999000 (1000 bins): lower median bin
    // = 499000 (cum 500000 = n/2); |v - med| bins give MAD 250000
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((1000000L, 499000L, 250000L)))
    // the histogram fed to the window holds one row per bin, not per value:
    // domain span 0..999999 / binWidth -> exactly 1000 rows per group
    val binnedDistinct = rows
      .select((col("v") - ((col("v") % bw + bw) % bw)).as("vb"))
      .distinct().count()
    assert(binnedDistinct === 1000L)
    // unbinned would have paid a 1e6-row window partition; binned pays 1e3
  }

  test("floor-binning is exact for negative values") {
    val rows = Seq(("n", -5L), ("n", -4L), ("n", -3L), ("n", 3L), ("n", 5L)).toDF("g", "v")
    val r = ops.Anomaly.madThresholds(rows, "g", "v", 3000L, binWidth = 4L).collect()(0)
    // floor-bins of [-5,-4,-3,3,5] at width 4: [-8,-4,-4,0,4] -> lower median -4
    assert(r.getLong(2) === -4L)
  }
}

/** New-operator cache lifecycle: SetSim and Triangles release their
  * intermediates; the caller owns exactly the returned result.
  */
class NewOpCacheSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("SetSim.prefixJoin leaves only its materialized result persisted") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val r = dedup.SetSim.prefixJoin(docs, tX1000 = 600)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).size === 1)
    r.unpersist(blocking = true)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("Triangles.perNode leaves only its materialized result persisted") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val r = graph.Triangles.perNode(edges)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).size === 1)
    r.unpersist(blocking = true)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}

class RepetitionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bigram-stuffed and span-duplicated docs flagged; varied doc kept") {
    val dupSpan = "alpha beta gamma delta epsilon" // a 5-word span
    val docs = Seq(
      // one bigram dominates: "buy now" repeated 6 times = 12 of 13 words
      (1L, "buy now buy now buy now buy now buy now buy now please"),
      // lyrics-style loop: the span repeats back-to-back, so EVERY
      // 5-gram window (including wrap-around windows) occurs >= 2 times
      (2L, s"$dupSpan $dupSpan $dupSpan"),
      (3L, "a genuinely varied sentence where every single word differs " +
        "completely from its neighbor so no phrase ever repeats at all"),
      (4L, "")
    ).toDF("doc_id", "text")
    val r = text.Repetition.metrics(docs).orderBy("doc_id").collect()

    // doc 1: top bigram "buy now" count=6, len=7 -> 42 chars of 54 canon
    assert(r(0).getAs[Long]("top2_chars") === 42L)
    assert(r(0).getAs[Double]("top_bigram_frac") > 0.7)
    assert(r(0).getAs[Boolean]("keep") === false)

    // doc 2: 15 words -> 11 window positions, every window's gram
    // occurs >= 2 times across the three span copies -> frac = 1.0
    assert(r(1).getAs[Long]("tot5_occ") === 11L)
    assert(r(1).getAs[Double]("dup5_frac") === 1.0)
    assert(r(1).getAs[Boolean]("keep") === false)

    // doc 3: all words distinct -> no repeated grams at all
    assert(r(2).getAs[Long]("dup5_occ") === 0L)
    assert(r(2).getAs[Double]("top_bigram_frac") < 0.2)
    assert(r(2).getAs[Boolean]("keep") === true)

    // doc 4: empty -> zeros, kept (emptiness is Gopher.metrics' job)
    assert(r(3).getAs[Long]("n_chars_canon") === 0L)
    assert(r(3).getAs[Double]("top_bigram_frac") === 0.0)
    assert(r(3).getAs[Double]("dup5_frac") === 0.0)
    assert(r(3).getAs[Boolean]("keep") === true)
  }

  test("short docs yield one whole-text gram; no phantom repetition") {
    val r = text.Repetition.metrics(
        Seq((1L, "two words")).toDF("doc_id", "text"))
      .collect()(0)
    // single whole-text gram for both k -> count 1, never duplicated
    assert(r.getAs[Long]("tot5_occ") === 1L)
    assert(r.getAs[Long]("dup5_occ") === 0L)
    // top2_chars = 1 * len("two words") = 9
    assert(r.getAs[Long]("top2_chars") === 9L)
  }
}

class TemperatureMixSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // head source holds 90% of tokens (9 docs x 10 tokens), tail 10%
  private val docs = (
    (1L to 9L).map(i => (i, "head", ("w " * 10).trim)) :+
      (10L, "tail", ("w " * 10).trim)
  ).toDF("doc_id", "source", "text")

  test("sqrt temperature upweights the tail source vs raw share") {
    val sel = ops.Sample.temperatureMix(
      docs, "source", "doc_id", text.Text.wordCount(col("text")),
      budgetFrac = 0.5)
    val bysrc = sel.groupBy("source").agg(sum("toks").as("t"))
      .as[(String, Long)].collect().toMap
    // budgets: z = sqrt(.9)+sqrt(.1); head w=.9487/z=.75, tail .25
    // head budget = .75*50 = 37.5 tokens -> 4 docs (cum_before<37.5 at 30)
    // tail budget = .25*50 = 12.5 -> its single 10-token doc admits
    assert(bysrc("head") === 40L)
    assert(bysrc("tail") === 10L)
    // raw-share mixing at the same budget would give the tail
    // .1*50 = 5 tokens -> zero whole docs; sqrt temperature admits it
  }

  test("selection is a doc_id prefix per source") {
    val sel = ops.Sample.temperatureMix(
        docs, "source", "doc_id", text.Text.wordCount(col("text")), 0.5)
      .select("source", "doc_id").as[(String, Long)].collect()
    val heads = sel.filter(_._1 == "head").map(_._2).sorted
    assert(heads === (1L to heads.length).toArray)
  }

  test("empty corpus is rejected with a clear message") {
    val e = intercept[IllegalArgumentException] {
      ops.Sample.temperatureMix(
        Seq((1L, "s", "")).toDF("doc_id", "source", "text"),
        "source", "doc_id", text.Text.wordCount(col("text")), 0.5)
    }
    assert(e.getMessage.contains("no tokens"))
  }
}

class VerifyGuardSpec extends AnyFunSuite {
  test("filtered Verify refuses an outDir already holding a manifest") {
    val out = java.nio.file.Files.createTempDirectory("vguard").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"), "{}")
    val e = intercept[IllegalArgumentException] {
      Verify.main(Array("/root/testdata/sf0.001", out, "q1_agg"))
    }
    assert(e.getMessage.contains("refusing FILTERED run"))
  }
}

class InfoTheorySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // qln reference values: floor(ln(x) * 1e9)
  private val qln2 = 693147180L
  private val qln3 = 1098612288L
  private val qln4 = 1386294361L
  private val qln5 = 1609437912L

  test("entropy: exact quantized-log integers, nats, and the keep gate") {
    val docs = Seq(
      (1L, "a a a a"), // one word repeated -> H = 0
      (2L, "a b c d"), // all distinct -> H = ln(4)
      (3L, "a a b"),   // mixed -> 3*qln(3) - 2*qln(2)
      (4L, "")         // wordless -> zeros, dropped by the gate
    ).toDF("doc_id", "text")
    val r = text.InfoTheory.entropy(docs, keepMinNats = 1.0)
      .orderBy("doc_id").collect()

    assert(r(0).getAs[Long]("ent_q") === 0L)
    assert(r(0).getAs[Double]("entropy_nats") === 0.0)
    assert(r(0).getAs[Boolean]("keep") === false)

    assert(r(1).getAs[Long]("n_words") === 4L)
    assert(r(1).getAs[Long]("n_distinct") === 4L)
    assert(r(1).getAs[Long]("ent_q") === 4L * qln4)
    assert(math.abs(r(1).getAs[Double]("entropy_nats") - math.log(4.0)) < 1e-8)
    assert(r(1).getAs[Boolean]("keep") === true)

    assert(r(2).getAs[Long]("ent_q") === 3L * qln3 - 2L * qln2)
    assert(math.abs(r(2).getAs[Double]("entropy_nats") - 0.636514168) < 1e-8)

    assert(r(3).getAs[Long]("n_words") === 0L)
    assert(r(3).getAs[Double]("entropy_nats") === 0.0)
    assert(r(3).getAs[Boolean]("keep") === false)
  }

  test("surprisal: corpus-fit unigram LM, rare words score higher") {
    // corpus: cf(a)=4, cf(b)=1, T=5
    val docs = Seq((1L, "a a a"), (2L, "a b")).toDF("doc_id", "text")
    val r = text.InfoTheory.surprisal(docs, keepLoNats = 0.5, keepHiNats = 1.0)
      .orderBy("doc_id").collect()

    // doc 1: 3*qln(5) - 3*qln(4)
    assert(r(0).getAs[Long]("sur_q") === 3L * qln5 - 3L * qln4)
    assert(math.abs(r(0).getAs[Double]("avg_surprisal") - 0.223143551) < 1e-8)
    assert(r(0).getAs[Boolean]("keep") === false) // too predictable

    // doc 2: 2*qln(5) - (qln(4) + qln(1)) ; qln(1) = 0
    assert(r(1).getAs[Long]("sur_q") === 2L * qln5 - qln4)
    assert(math.abs(r(1).getAs[Double]("avg_surprisal") - 0.9162907315) < 1e-8)
    assert(r(1).getAs[Boolean]("keep") === true)

    assert(r(1).getAs[Double]("avg_surprisal") > r(0).getAs[Double]("avg_surprisal"))
  }

  test("surprisal rejects a wordless corpus with a clear message") {
    val e = intercept[IllegalArgumentException] {
      text.InfoTheory.surprisal(
        Seq((1L, "...")).toDF("doc_id", "text"), 0.0, 1.0)
    }
    assert(e.getMessage.contains("no words"))
  }
}

class HashSplitSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.functions.{Mix64, Mix64Long}
  import org.apache.spark.sql.graftbridge.ColumnBridge

  test("Mix64Long matches Mix64.apply through codegen, including negatives") {
    val ids = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue)
    val got = ids.toDF("x")
      .select(ColumnBridge.column(Mix64Long(ColumnBridge.expression(col("x")))).as("h"))
      .as[Long].collect()
    assert(got.toSeq === ids.map(Mix64(_)))
  }

  test("hashSplit accounting matches a direct Mix64 replay and is deterministic") {
    val n = 1000
    val docs = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd", "w x"))
      .toDF("doc_id", "source", "text")
    def run() = ops.Sample.hashSplit(
        docs, "doc_id", "source", lit(1L), trainPct = 80, valPct = 10)
      .orderBy("source", "split").collect()
    val r1 = run()
    assert(r1.toSeq === run().toSeq, "same input must produce the same split")

    // replay the assignment rule directly on the driver
    def splitOf(id: Long): String = {
      val b = (Mix64(id) >>> 32) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val expect = (0 until n)
      .map(i => ((if (i % 2 == 0) "even" else "odd", splitOf(i.toLong)), 1))
      .groupBy(_._1).view.mapValues(_.size).toMap
    r1.foreach { row =>
      val k = (row.getAs[String]("source"), row.getAs[String]("split"))
      assert(row.getAs[Long]("n_docs") === expect(k).toLong, s"count mismatch at $k")
      assert(row.getAs[Long]("n_tokens") === row.getAs[Long]("n_docs")) // tokens = lit(1)
    }
    assert(r1.map(_.getAs[Long]("n_docs")).sum === n.toLong)

    // docs_frac sums to 1 within each source
    r1.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("docs_frac")).sum - 1.0) < 1e-12)
    }
  }

  test("hashSplit rejects percentages that leave no test slice") {
    val e = intercept[IllegalArgumentException] {
      ops.Sample.hashSplit(
        Seq((1L, "s", "t")).toDF("doc_id", "source", "text"),
        "doc_id", "source", lit(1L), trainPct = 90, valPct = 10)
    }
    assert(e.getMessage.contains("hashSplit"))
  }
}

class FusionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("rrf2 fuses ranks, handles missing legs, breaks ties on vec_id") {
    val vec = Seq((1L, 10L, 1L), (1L, 11L, 2L))
      .toDF("query_id", "vec_id", "vrnk")
    val lex = Seq((1L, 11L, 1L), (1L, 12L, 2L))
      .toDF("query_id", "vec_id", "lrnk")
    val r = ops.Fusion.rrf2(vec, lex).orderBy("rnk").collect()

    assert(r.map(_.getAs[Long]("vec_id")).toSeq === Seq(11L, 10L, 12L))
    // both legs: 1/(60+2) + 1/(60+1), added vec-term-first
    assert(r(0).getAs[Double]("rrf") === 1.0 / 62 + 1.0 / 61)
    // vec only / lex only: single term, other leg null
    assert(r(1).getAs[Double]("rrf") === 1.0 / 61)
    assert(r(1).isNullAt(r(1).fieldIndex("lrnk")))
    assert(r(2).getAs[Double]("rrf") === 1.0 / 62)
    assert(r(2).isNullAt(r(2).fieldIndex("vrnk")))
  }

  test("rrf2 equal scores fall back to vec_id order; topK truncates") {
    val vec = Seq((1L, 30L, 1L)).toDF("query_id", "vec_id", "vrnk")
    val lex = Seq((1L, 20L, 1L)).toDF("query_id", "vec_id", "lrnk")
    val both = ops.Fusion.rrf2(vec, lex).orderBy("rnk").collect()
    assert(both.map(_.getAs[Long]("vec_id")).toSeq === Seq(20L, 30L)) // tie -> id asc
    val top1 = ops.Fusion.rrf2(vec, lex, topK = 1).collect()
    assert(top1.length === 1 && top1(0).getAs[Long]("vec_id") === 20L)
  }

  test("q_hybrid_rrf end-to-end: 10 fused results per query, rrf consistent") {
    val r = SparkEntry.queries("q_hybrid_rrf")(spark, dir).collect()
    val byQ = r.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq === (1L to rows.length))
      assert(rows.length <= 10)
    }
    r.foreach { row =>
      def leg(c: String): Double =
        if (row.isNullAt(row.fieldIndex(c))) 0.0 else 1.0 / (60.0 + row.getAs[Long](c))
      assert(row.getAs[Double]("rrf") === leg("vrnk") + leg("lrnk"))
    }
    spark.catalog.clearCache()
  }
}

class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("pair counts are occurrence-weighted over the word dictionary") {
    val docs = Seq(
      (1L, "aa ab aa"), // dict: aa freq 2, ab freq 1
      (2L, "abc"),      // pairs ab, bc at freq 1
      (3L, "a b"),      // single-char words contribute nothing
      (4L, "")
    ).toDF("doc_id", "text")
    val got = text.Bpe.pairCounts(docs)
      .as[(String, Long)].collect().toMap
    assert(got === Map("aa" -> 2L, "ab" -> 2L, "bc" -> 1L))
  }
}

class PoissonSampleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("fixed-size per stratum, weight-zero rows excluded, ranks ascending") {
    val docs = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b",
      if (i % 10 == 0) 0L else i)).toDF("doc_id", "source", "wt")
    val r = ops.Sample.poissonSample(docs, "doc_id", "source", col("wt"), 7)
      .orderBy("stratum", "rank").collect()
    val byS = r.groupBy(_.getAs[String]("stratum"))
    assert(byS.keySet === Set("a", "b"))
    byS.values.foreach { rows =>
      assert(rows.length === 7)
      val ranks = rows.map(_.getAs[Double]("rank")).toSeq
      assert(ranks === ranks.sorted)
    }
    // weight-0 rows (doc_id % 10 == 0) never selected
    assert(!r.exists(_.getAs[Long]("doc_id") % 10 == 0))
    // rank is exactly u / w for exact integers u, w
    r.foreach { row =>
      assert(row.getAs[Double]("rank") * 0 == 0) // finite
      assert(row.getAs[Long]("w") > 0L)
    }
  }

  test("selection odds follow weight: giant-weight rows always win") {
    // 200 unit-weight rows vs 5 rows at weight 2^40: rank = u/w with
    // u <= 2^32 makes every heavy rank < 1 while unit ranks are huge
    val docs = ((1L to 200L).map(i => (i, "s", 1L)) ++
      (201L to 205L).map(i => (i, "s", 1L << 40))).toDF("doc_id", "source", "wt")
    val picked = ops.Sample.poissonSample(docs, "doc_id", "source", col("wt"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(picked === Set(201L, 202L, 203L, 204L, 205L))
  }

  test("deterministic and repartition-stable") {
    val docs = (1L to 60L).map(i => (i, "s", i)).toDF("doc_id", "source", "wt")
    val a = ops.Sample.poissonSample(docs, "doc_id", "source", col("wt"), 10)
      .orderBy("doc_id").collect().toSeq
    val b = ops.Sample.poissonSample(docs.repartition(13), "doc_id", "source", col("wt"), 10)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}

class PiiSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def detectOne(t: String): (Long, Long, Long) = {
    val r = text.Pii.detect(Seq(t).toDF("text"), col("text"))
      .select("n_emails", "n_phones", "n_ips").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("detects emails, test-range phones, and IPv4 literals") {
    assert(detectOne("mail a.b+c@ex-corp.org or X@Y.io, call 555-0142 from 10.0.3.1")
      === ((2L, 1L, 1L)))
  }

  test("digit runs, ids, and dotted versions do not false-positive") {
    // 5551234: no separator; 555-12345: trailing boundary fails on the
    // 5th digit; a555-0142: leading boundary fails; 1.2.3: only 3 quads
    assert(detectOne("order 5551234 ref 555-12345 code a555-0142 v1.2.3")
      === ((0L, 0L, 0L)))
  }

  test("phone inside an email local part is counted once as email shape") {
    // \b before 555 holds (- is a non-word char), so the digits also
    // match the phone pattern -- the audit counts SHAPES independently;
    // scrubbing order (email first) is Text.scrubPii's concern
    assert(detectOne("u-555-0142@ex.org") === ((1L, 1L, 0L)))
  }

  test("audit aggregates per source with doc and occurrence counts") {
    val docs = Seq(
      (1L, "a", "x@y.io and z@w.io"),
      (2L, "a", "clean"),
      (3L, "b", "call 555-0001 or 555-0002 from 10.1.1.1")
    ).toDF("doc_id", "source", "text")
    val r = text.Pii.audit(docs, col("text"), col("source"))
      .orderBy("source").collect()
    assert(r(0).toSeq === Seq("a", 2L, 1L, 2L, 0L, 0L, 0L, 0L))
    assert(r(1).toSeq === Seq("b", 1L, 0L, 0L, 1L, 2L, 1L, 1L))
  }
}

class BigramSurprisalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val qln2 = 693147180L

  test("exact quantized-log integers over the corpus-fit bigram LM") {
    // corpus bigrams: d1 = {ab, bc}, d2 = {ab, bb}
    //   cfb: ab=2, bc=1, bb=1 ; ctx: a=2, b=2
    val docs = Seq((1L, "a b c"), (2L, "a b b"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val r = text.InfoTheory.bigramSurprisal(docs, keepLoNats = 0.1, keepHiNats = 0.5)
      .orderBy("doc_id").collect()

    // d1: ab -> qln2-qln2 = 0 ; bc -> qln(ctx b)=qln2 minus qln(1)=0
    assert(r(0).getAs[Long]("n_bigrams") === 2L)
    assert(r(0).getAs[Long]("sur_q") === qln2)
    assert(math.abs(r(0).getAs[Double]("avg_surprisal") - math.log(2.0) / 2) < 1e-8)
    assert(r(0).getAs[Boolean]("keep") === true)

    // d2 mirrors d1 (bb also unique with ctx b = 2)
    assert(r(1).getAs[Long]("sur_q") === qln2)

    // single-word and empty docs: no bigrams, score 0, gated out
    Seq(r(2), r(3)).foreach { row =>
      assert(row.getAs[Long]("n_bigrams") === 0L)
      assert(row.getAs[Double]("avg_surprisal") === 0.0)
      assert(row.getAs[Boolean]("keep") === false)
    }
  }

  test("the corpus-dominant continuation scores below the rare one") {
    // ctx(a) = 5 splits 4:1 between x and y -- the doc riding the
    // dominant pair (a x) is predictable, the rare continuation (a y)
    // is surprising under the same fit
    val docs = Seq(
      (1L, "a x a x a x a x"),
      (2L, "a y")
    ).toDF("doc_id", "text")
    val r = text.InfoTheory.bigramSurprisal(docs, 0.0, 99.0)
      .orderBy("doc_id").collect()
    val d1 = r(0).getAs[Double]("avg_surprisal")
    val d2 = r(1).getAs[Double]("avg_surprisal")
    assert(math.abs(d1 - 4 * (math.log(5) - math.log(4)) / 7) < 1e-8)
    assert(math.abs(d2 - math.log(5)) < 1e-8)
    assert(d1 < d2)
  }
}

class SpansSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("cross-doc duplicated positions counted, intra-doc repeats are not") {
    val docs = Seq(
      (1L, "a b c"),     // grams(2): "a b", "b c"
      (2L, "b c d"),     // grams:    "b c", "c d"
      (3L, "x y x y"),   // grams: "x y", "y x", "x y" -- repeats only HERE
      (4L, "q")          // too short: 0 grams
    ).toDF("doc_id", "text")
    val r = text.Spans.duplicated(docs, n = 2, maxDupFrac = 0.4)
      .orderBy("doc_id").collect()

    assert(r(0).getAs[Long]("n_grams") === 2L)
    assert(r(0).getAs[Long]("dup_grams") === 1L) // "b c" also in d2
    assert(r(0).getAs[Double]("dup_frac") === 0.5)
    assert(r(0).getAs[Boolean]("keep") === false)

    assert(r(1).getAs[Long]("dup_grams") === 1L)

    // d3's "x y" occurs twice but only in one doc: not duplicated
    assert(r(2).getAs[Long]("n_grams") === 3L)
    assert(r(2).getAs[Long]("dup_grams") === 0L)
    assert(r(2).getAs[Boolean]("keep") === true)

    assert(r(3).getAs[Long]("n_grams") === 0L)
    assert(r(3).getAs[Double]("dup_frac") === 0.0)
    assert(r(3).getAs[Boolean]("keep") === true)
  }

  test("a shared template around unique text is localized") {
    val tpl = "terms of service apply to all content on this site"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta $tpl"),
      (2L, s"one two three four five six seven eight $tpl")
    ).toDF("doc_id", "text")
    val r = text.Spans.duplicated(docs, n = 8, maxDupFrac = 0.2)
      .orderBy("doc_id").collect()
    // the 10-word template contributes duplicated 8-gram positions in both
    r.foreach { row =>
      assert(row.getAs[Long]("dup_grams") >= 1L)
      assert(row.getAs[Boolean]("keep") === false)
    }
  }
}

class EigenSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mk(vs: Seq[Seq[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")

  test("recovers the dominant axis of an axis-aligned corpus") {
    // 20 vectors on the x-axis, 2 on y: top direction is +-x
    val docs = mk(Seq.fill(20)(Seq(1f, 0f, 0f, 0f)) ++ Seq.fill(2)(Seq(0f, 1f, 0f, 0f)))
    val v = vec.Eigen.topDirection(docs, iters = 3, scaleMax = 4096L)
      .orderBy("dim").select("v_q").as[Long].collect()
    assert(math.abs(v(0)) === 4096L)
    assert(math.abs(v(1)) < 4096L / 4)
    assert(v(2) === 0L && v(3) === 0L)
  }

  test("deterministic and repartition-stable") {
    val docs = mk(Seq.tabulate(50)(i =>
      Seq((i % 7).toFloat, (i % 3).toFloat, 1f, (i % 5).toFloat)))
    val a = vec.Eigen.topDirection(docs, 3).orderBy("dim").collect().toSeq
    val b = vec.Eigen.topDirection(docs.repartition(11), 3).orderBy("dim").collect().toSeq
    assert(a === b)
  }

  test("max-norm of the iterate is exactly scaleMax") {
    val docs = mk(Seq.tabulate(30)(i => Seq(1f, (i % 2).toFloat, 0.5f, 0.1f)))
    val v = vec.Eigen.topDirection(docs, 2, scaleMax = 1000L)
      .select("v_q").as[Long].collect()
    assert(v.map(math.abs).max === 1000L)
  }
}

class BurstSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("flagOutliers preserves caller columns and flags beyond k*MAD") {
    // group g: values 10 x7, 12 x2, then a 100 burst -> med 10, mad 0->1
    val rows = (Seq.fill(7)(10L) ++ Seq.fill(2)(12L) ++ Seq(100L))
      .zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("grp", "bucket", "v")
    val r = ops.Anomaly.flagOutliers(rows, "grp", "v", devX1000 = 3000L)
    assert(r.columns.toSet === Set("grp", "bucket", "v", "med", "mad", "is_out"))
    val flagged = r.where(col("is_out")).select("bucket").as[Long].collect()
    assert(flagged.toSeq === Seq(9L)) // only the 100 burst
    val med = r.select("med").as[Long].head()
    assert(med === 10L)
  }

  test("matches madThresholds outlier accounting") {
    val rows = (1L to 200L).map(i => ("a", i, if (i % 50 == 0) 500L else i % 7))
      .toDF("grp", "bucket", "v")
    val nFlagged = ops.Anomaly.flagOutliers(rows, "grp", "v", 3000L)
      .where(col("is_out")).count()
    val nThresh = ops.Anomaly.madThresholds(
      rows.select(col("grp"), col("v")), "grp", "v", 3000L)
      .select("n_outliers").as[Long].head()
    assert(nFlagged === nThresh)
  }
}

class CentroidSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mk(rows: Seq[(Long, Int, Seq[Float])]) =
    rows.toDF("vec_id", "label", "embedding")

  test("well-separated classes classify perfectly; confusion is diagonal") {
    val rows =
      (0L to 9L).map(i => (i, 0, Seq(1f, 0f, 0f, 0f))) ++
      (10L to 19L).map(i => (i, 1, Seq(0f, 1f, 0f, 0f))) ++
      (20L to 24L).map(i => (i, 2, Seq(0f, 0f, 1f, 1f)))
    val r = vec.Centroid.classify(mk(rows), k = 1024L)
    val got = r.orderBy("label", "pred").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    r.unpersist(blocking = true)
    assert(got === Seq((0L, 0L, 10L), (1L, 1L, 10L), (2L, 2L, 5L)))
  }

  test("an off-cluster point lands in the nearest other class") {
    val rows =
      (0L to 9L).map(i => (i, 0, Seq(1f, 0f))) ++
      (10L to 19L).map(i => (i, 1, Seq(0f, 1f))) ++
      Seq((20L, 0, Seq(0.1f, 1f))) // labeled 0, sits in class 1 territory
    val r = vec.Centroid.classify(mk(rows), k = 1024L)
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    r.unpersist(blocking = true)
    assert(got((0L, 1L)) === 1L) // the planted point confuses 0 -> 1
    assert(got((0L, 0L)) === 10L && got((1L, 1L)) === 10L)
  }

  test("leaves only its materialized result persisted") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val r = vec.Centroid.classify(
      mk((0L to 5L).map(i => (i, (i % 2).toInt, Seq(i.toFloat, 1f)))), k = 1024L)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).size === 1)
    r.unpersist(blocking = true)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}

class KnnGraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("neighbors are bucket-mates ranked by exact cosine, k-bounded") {
    // identical vectors share a bucket and have cosine 1.0
    val rows = (0L to 6L).map(i => (i, Seq(1f, 0.5f, 0.25f, 1f))) ++
      Seq((7L, Seq(-1f, 0.5f, -0.25f, -1f)))
    val r = ann.Ann.knnGraph(rows.toDF("vec_id", "embedding"), k = 3)
    val got = r.orderBy("vec_id", "rnk").collect()
    r.unpersist(blocking = true)
    val byV = got.groupBy(_.getAs[Long]("vec_id"))
    (0L to 6L).foreach { v =>
      val rows = byV(v)
      assert(rows.length === 3) // 6 identical candidates, k = 3 kept
      assert(rows.forall(_.getAs[Double]("cosine") === 1.0))
      // ties broken by ascending nbr_id
      val nbrs = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("nbr_id")).toSeq
      assert(nbrs === (0L to 6L).filter(_ != v).take(3))
    }
  }

  test("leaves only its materialized result persisted") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val r = ann.Ann.knnGraph(
      (0L to 5L).map(i => (i, Seq(1f, i.toFloat))).toDF("vec_id", "embedding"), k = 2)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).size === 1)
    r.unpersist(blocking = true)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}

class DominantBinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("argmax bin of the decoded histogram matches the pixel formula") {
    val docs = Seq(0L, 5L, 17L).toDF("doc_id")
    val r = mm.Multimodal.dominantBin(spark, mm.Multimodal.imageFrame(spark, docs))
      .collect().map(m => m.doc_id -> m).toMap
    Seq(0L, 5L, 17L).foreach { id =>
      val w = (8 + id % 9).toInt; val h = (8 + (id / 3) % 7).toInt
      val hist = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w)
        hist((((id * 31 + x * 7 + y * 13) % 256) / 16).toInt) += 1
      val best = hist.zipWithIndex.maxBy { case (c, i) => (c, -i) }
      assert(r(id).width === w && r(id).height === h)
      assert(r(id).dom_bin === best._2.toLong)
      assert(r(id).dom_count === best._1)
    }
  }
}

class WinnowSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("detection guarantee: a shared run of >= w+k-1 words yields a shared fingerprint") {
    // k=4, w=5: any shared 8-word run must surface at least one shared fp
    val run = "zero one two three four five six seven"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $run epsilon"),
      (2L, s"$run omega psi chi phi upsilon"),
      (3L, "totally different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val fp = dedup.Winnow.fingerprints(docs)
    val byDoc = fp.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
  }

  test("density: winnowing selects far fewer fingerprints than grams") {
    val text = (1 to 200).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val nFp = dedup.Winnow.fingerprints(docs).count()
    val nGrams = 200 - 4 + 1
    assert(nFp < nGrams / 2) // expected ~2/(w+1) density
    assert(nFp > 0)
  }

  test("sharedPairs caps hot fingerprints and honors minShared") {
    // 60 docs sharing one template sentence: its fps exceed maxDf=50 and
    // are dropped, so no pair survives; two docs sharing a long unique
    // run do pair
    val tpl = "shared boiler plate sentence appears in every single doc"
    val longRun = "unique run alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((1L to 60L).map(i => (i, s"$tpl filler$i")) ++
      Seq((100L, s"$longRun tail one"), (101L, s"$longRun tail two")))
      .toDF("doc_id", "text")
    val pairs = dedup.Winnow.sharedPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)))
    assert(pairs.forall { case (a, b) => a >= 100L && b >= 100L })
  }
}

class TablesSchemaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.types._

  // micro-aligned nanos so all three physical layouts agree bit-exactly
  private def baseNanos = Seq(
    (1L, 1700000000123456000L, 10L, "view", 1.5, "{}"),
    (2L, 1700000003987654000L, 10L, "purchase", 2.5, "{}"),
    (3L, 1700086400000000000L, 11L, "view", 0.5, "{}"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("events loader adapts all three ts layouts to the same ts_ns/ts pair") {
    val dirs = Seq(
      ("nanos_long", baseNanos),
      ("micros_tz", baseNanos.withColumn("ts", timestamp_micros(expr("ts div 1000")))),
      ("micros_ntz", baseNanos.withColumn(
        "ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))))
    val results = dirs.map { case (tag, df) =>
      val d = TmpDirs.create(s"tbl_$tag")
      df.write.mode("overwrite").parquet(s"$d/events.parquet")
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts_ns").dataType === LongType, tag)
      assert(ev.schema("ts").dataType === TimestampType, tag)
      val rows = ev
        .select(col("event_id"), col("ts_ns"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      tag -> rows
    }
    val want = results.head._2
    results.tail.foreach { case (tag, rows) => assert(rows === want, tag) }
    assert(want.map(_._2) === Seq(
      1700000000123456000L, 1700000003987654000L, 1700086400000000000L))
  }

  test("schema drift fails the load with a message naming table, column, and types") {
    val d = TmpDirs.create("tbl_drift")
    baseNanos.withColumn("value", lit("oops"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, d))
    assert(e.getMessage.contains("schema drift"))
    assert(e.getMessage.contains("events"))
    assert(e.getMessage.contains("value is string (want double)"))
  }

  test("a missing required column is reported as MISSING, not a resolve error") {
    val d = TmpDirs.create("tbl_miss")
    baseNanos.drop("props").write.mode("overwrite").parquet(s"$d/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, d))
    assert(e.getMessage.contains("props MISSING"))
  }
}

class ContainmentSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("containment finds the doc-in-doc pair symmetric Jaccard misses") {
    // A (5 elements) sits entirely inside B (50 elements): containment
    // A-in-B = 1.0 but Jaccard = 5/50 = 0.1 — below any dedup threshold
    val sets = Seq(
      (1L, (1L to 5L).toArray),
      (2L, (1L to 50L).toArray),
      (3L, Array(100L, 101L, 102L)))
      .toDF("doc_id", "sh")
    val out = dedup.SetSim.containJoinSets(sets, tX1000 = 800, maxTokenDf = 1000)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5))).toSet
    out.unpersist()
    assert(rows === Set((1L, 2L, 5L, 1000L))) // A-in-B only; B-in-A is 100 permille
  }

  test("prefix-on-probe-side candidates are complete at the threshold boundary") {
    // A shares exactly 4 of its 5 elements with B: containment 800 — ON
    // the t=0.8 threshold; the pair must survive (>=, not >)
    val sets = Seq(
      (1L, Array(1L, 2L, 3L, 4L, 99L)),
      (2L, (1L to 40L).toArray))
      .toDF("doc_id", "sh")
    val out = dedup.SetSim.containJoinSets(sets, tX1000 = 800, maxTokenDf = 1000)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSet
    out.unpersist()
    assert(rows === Set((1L, 2L, 800L)))
  }
}

class BenchErrorSpec extends AnyFunSuite {
  import TestSpark._

  test("a deliberately broken query is an error, never a time") {
    val qs: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "good" -> ((s, d) => Tables.region(s, d)),
      "broken" -> ((s, d) => Tables.region(s, d).select(col("no_such_column"))))
    val passes = Bench.timedPasses(spark, dir, qs, nPasses = 1)
    assert(passes.length === 1)
    assert(passes.head("good").isRight)
    val bad = passes.head("broken")
    assert(bad.isLeft)
    assert(bad.left.exists(_.nonEmpty)) // carries the failure class+message
  }
}

class StreamLayoutSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.types._

  test("streaming events source adapts both ts layouts; stream equals across them") {
    val base = Seq(
      (1L, 1700000000000000000L, 1L, "view", 1.0, "{}"),
      (2L, 1700000001000000000L, 1L, "purchase", 2.0, "{}"),
      (3L, 1700003600000000000L, 2L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val layouts = Seq(
      "nanos" -> base,
      "ntz" -> base.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType)))
    val results = layouts.map { case (tag, df) =>
      // the streaming source globs for a FILE named events.parquet (the
      // testdata layout); stage the write and move the single part file
      val d = TmpDirs.create(s"sl_$tag")
      df.coalesce(1).write.mode("overwrite").parquet(s"$d/stage")
      val part = new java.io.File(s"$d/stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$d/events.parquet"))
      val out = streaming.EventsStream.runToMemory(spark,
        streaming.EventsStream.hourlyCounts(spark, d), s"slspec_$tag")
      out.orderBy("hour_start", "event_type").collect().map(_.toString).toSeq
    }
    assert(results.head.nonEmpty)
    assert(results.head === results(1))
  }
}

class KmvSpec extends AnyFunSuite {
  import TestSpark._

  test("KMV sketch: merge property holds and estimator is exact below k") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_events_kmv_distinct")(spark, dir).collect()
    val (total, days) = rows.partition(_.getString(0) == "TOTAL")
    assert(total.length === 1 && days.nonEmpty)
    // estimator exactness below k: any bucket with n_exact < 16 must
    // report est == exact (the sketch holds every distinct hash)
    days.filter(_.getLong(1) < 16).foreach { r =>
      assert(r.getLong(2) === r.getLong(1), s"bucket ${r.getString(0)}")
    }
    // sketch estimate is within 50% of exact at k=16 on this data — a
    // loose envelope: the point is the estimator runs, error is published
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est > 0 && math.abs(est - exact).toDouble / exact < 0.5,
        s"bucket ${r.getString(0)}: est $est vs exact $exact")
    }
    // merge property: the TOTAL estimate must equal the estimate computed
    // from the union of per-day k-mins — which is how it is built; cross
    // check against a direct global KMV over the raw fact table
    val ev = Tables.events(spark, dir)
    val k = 16
    import org.apache.spark.sql.functions._
    val h = shiftrightunsigned(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.Mix64Long(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            col("user_id").cast("long")))), 32)
    val kth = ev.select(h.as("h")).distinct().orderBy("h").limit(k)
      .agg(max("h")).head().getLong(0)
    val direct = 15L * 4294967296L / kth
    assert(total.head.getLong(2) === direct,
      "TOTAL (union-of-day-sketches) must equal the direct global sketch")
  }
}

class AudioSpec extends AnyFunSuite {
  import TestSpark._

  test("WAV codec round-trips PCM losslessly through the real AudioSystem") {
    val samples = Array.tabulate(1003)(i => mm.Audio.sampleValue(7L, i).toByte)
    val wav = mm.Audio.encodeWav(samples)
    assert(new String(wav.take(4), "US-ASCII") === "RIFF") // real container
    val (fmt, decoded) = mm.Audio.decodeWav(wav)
    assert(fmt.getSampleSizeInBits === 8 && fmt.getChannels === 1)
    assert(decoded.toSeq === samples.toSeq)
  }

  test("corrupt audio bytes fail loudly, not silently") {
    intercept[Exception] {
      mm.Audio.decodeWav(Array[Byte](1, 2, 3, 4, 5))
    }
  }

  test("envelope covers every sample exactly once incl. the partial tail window") {
    val docs = spark.range(0, 10).toDF("doc_id")
    val env = mm.Audio.envelope(spark, mm.Audio.audioFrame(spark, docs)).collect()
    docs.collect().map(_.getLong(0)).foreach { id =>
      val rows = env.filter(_.doc_id == id)
      assert(rows.map(_.n_samples).sum === mm.Audio.sampleCount(id))
      assert(rows.map(_.n_samples).init.forall(_ == 256)) // full windows
      assert(rows.last.n_samples < 256) // 1000+… mod 256 is never 0
    }
  }
}

class KmvStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("k-min fold law: merge is associative/idempotent over the represented set") {
    val k = 16
    val a = Array.tabulate(40)(i => graft.functions.Mix64(i.toLong) >>> 32)
    val (x, y, z) = (a.slice(0, 15), a.slice(15, 30), a.slice(30, 40))
    val allAtOnce = streaming.KmvStream.mergeKmin(Array.empty, a, k)
    val folded = streaming.KmvStream.mergeKmin(
      streaming.KmvStream.mergeKmin(
        streaming.KmvStream.mergeKmin(Array.empty, x, k), y, k), z, k)
    assert(folded.toSeq === allAtOnce.toSeq)
    // idempotent: re-feeding already-absorbed hashes changes nothing
    assert(streaming.KmvStream.mergeKmin(folded, x, k).toSeq === folded.toSeq)
  }

  test("streaming per-day KMV sketches equal the batch operator's day rows") {
    val dir = "/root/testdata/sf0.01"
    val streamed = streaming.EventsStream.runToMemory(spark,
        streaming.KmvStream.sketchStream(spark, dir).toDF(), "kmvstream", mode = "update")
      .collect().map(r => r.getLong(0).toString -> r.getLong(3)).toMap
    val batch = SparkEntry.queries("q_events_kmv_distinct")(spark, dir)
      .collect().filter(_.getString(0) != "TOTAL")
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(streamed === batch)
  }
}

/** Round-8 additions: TPC-H join shapes, KMV set ops, lag features,
  * Zipf slope. Invariants recomputed independently of the oracle SQL.
  */
class R8ShapesSpec extends AnyFunSuite {
  import TestSpark._

  private val sf01 = "/root/testdata/sf0.01"

  test("q_local_volume: only ASIA nations, ordered by revenue desc") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_local_volume")(spark, sf01).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val asia = Tables.nation(spark, sf01)
      .join(Tables.region(spark, sf01).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.forall(r => asia(r.getString(0))))
    val revs = rows.map(_.getLong(1))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q_priority_class: high+low equals the joined row count in window") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_priority_class")(spark, sf01).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val direct = Tables.lineitem(spark, sf01)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf01),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(total === direct && rows.length === 2)
  }

  test("q_large_orders: every order's qty matches a direct recompute and beats the threshold") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_large_orders")(spark, sf01).collect()
    assert(rows.nonEmpty)
    val direct = Tables.lineitem(spark, sf01).groupBy("l_orderkey")
      .agg(sum(round(col("l_quantity") * 100, 0).cast("long")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (ok, qty) = (r.getLong(2), r.getLong(5))
      assert(qty > 25000L && direct(ok) === qty)
    }
  }

  test("q_disjunctive_rev: the OR-of-ANDs predicate is pushed to the part scan") {
    val plan = SparkEntry.queries("q_disjunctive_rev")(spark, sf01)
      .queryExecution.executedPlan.toString
    // part-side disjuncts (brand/size bands) must reach the parquet scan
    // as one pushed Or predicate, not evaluate post-join
    assert(plan.contains("PushedFilters") && plan.contains("Or("), plan.take(800))
    spark.catalog.clearCache()
  }

  test("q_kmv_overlap: inclusion-exclusion bounds and published error hold") {
    val r = SparkEntry.queries("q_kmv_overlap")(spark, sf01).collect()(0)
    val (a, b, u, inter, exact) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(3))
    assert(u <= a + b)            // union sketch never exceeds the sum
    assert(inter <= math.min(a, b)) // intersection within both margins
    assert(inter === math.max(0L, a + b - u))
    assert(exact > 0 && math.abs(inter - exact).toDouble / exact < 0.5)
  }

  test("q_events_lag_features matches a per-user sliding recompute") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_events_lag_features")(spark, sf01)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    // independent recompute from the raw table, one user at a time
    val raw = Tables.events(spark, sf01).where(col("user_id") % 5 === 0)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        round(col("value") * 100, 0).cast("long").as("v_c"))
      .collect().groupBy(_.getLong(0))
    assert(rows.keySet === raw.keySet && rows.keySet.forall(_ % 5 == 0))
    rows.foreach { case (uid, got) =>
      val ordered = raw(uid).sortBy(r => (r.getLong(2), r.getLong(1)))
      val byEvent = got.map(r => r.getLong(1) -> r).toMap
      ordered.zipWithIndex.foreach { case (r, i) =>
        val g = byEvent(r.getLong(1))
        val expLag = if (i == 0) null else Long.box(ordered(i - 1).getLong(3))
        val expGap = if (i == 0) null
          else Long.box((r.getLong(2) - ordered(i - 1).getLong(2)) / 1000000000L)
        val expRoll = if (i == 0) null
          else Long.box(ordered.slice(math.max(0, i - 3), i).map(_.getLong(3)).sum)
        assert((if (g.isNullAt(3)) null else Long.box(g.getLong(3))) === expLag)
        assert((if (g.isNullAt(4)) null else Long.box(g.getLong(4))) === expGap)
        assert((if (g.isNullAt(5)) null else Long.box(g.getLong(5))) === expRoll)
      }
    }
  }

  test("text_zipf_slope matches a driver-side recompute from token counts") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("text_zipf_slope")(spark, sf01).collect()(0)
    val cf = Tables.documents(spark, sf01)
      .select(explode(text.Text.words(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cf"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(1000)
    def qln4(x: Long): Long = math.floor(math.log(x.toDouble) * 1e4).toLong
    val xy = cf.zipWithIndex.map { case ((_, c), i) => (qln4(i + 1L), qln4(c)) }
    val n = xy.length.toLong
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxx, sxy) = (xy.map(p => p._1 * p._1).sum, xy.map(p => p._1 * p._2).sum)
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === sx * sy - n * sxy)
    assert(r.getLong(2) === n * sxx - sx * sx)
    assert(r.getLong(3) === (sx * sy - n * sxy) * 1000 / (n * sxx - sx * sx))
  }
}

/** Round-8 batch 2: snapshot diff, seasonality, path entropy, and the
  * streaming feature twin.
  */
class R8DiffSpec extends AnyFunSuite {
  import TestSpark._

  private val sf01 = "/root/testdata/sf0.01"

  test("q_snapshot_diff: classified counts reconcile with the synthetic edit rates") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_snapshot_diff")(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val keys = Tables.orders(spark, sf01).select(col("o_orderkey").as("k"))
      .collect().map(_.getLong(0))
    val n = keys.length.toLong
    assert(rows((("insert"), "")) === keys.count(_ % 101 == 0))
    assert(rows((("delete"), "")) === keys.count(_ % 97 == 0))
    // updates partition into the three non-empty masks; survivors = same
    val upd = rows.filter(_._1._1 == "update").values.sum
    val expectedUpd = keys.count(k => k % 97 != 0 && (k % 13 == 0 || k % 29 == 0))
    assert(expectedUpd > 0) // the update plant fired — forall below is non-vacuous
    assert(upd === expectedUpd)
    assert(rows((("same"), "")) === n - keys.count(_ % 97 == 0) - expectedUpd)
    // every update row names at least one changed column
    assert(rows.keys.filter(_._1 == "update").forall(_._2.nonEmpty))
  }

  test("q_orders_seasonality: indexes sum to ~12000 permille and revenue reconciles") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_orders_seasonality")(spark, sf01).collect()
    assert(rows.length === 12)
    val total = rows.map(_.getLong(2)).sum
    val direct = Tables.orders(spark, sf01)
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))).head().getLong(0)
    assert(total === direct)
    val idxSum = rows.map(_.getLong(3)).sum
    // truncating division loses < 1 permille per row
    assert(idxSum > 12000 - 12 && idxSum <= 12000)
  }

  test("q_events_path_entropy: ent_q matches a driver-side recompute for the top user") {
    import org.apache.spark.sql.functions._
    val top = SparkEntry.queries("q_events_path_entropy")(spark, sf01).collect()
    assert(top.length === 20)
    assert(top.map(_.getLong(3)).toSeq === top.map(_.getLong(3)).sortBy(-_).toSeq)
    val u0 = top.head.getLong(0)
    val evs = Tables.events(spark, sf01).where(col("user_id") === u0)
      .select("ts_ns", "event_id", "event_type")
      .collect().sortBy(r => (r.getLong(0), r.getLong(1))).map(_.getString(2))
    val counts = evs.zip(evs.tail).groupBy(identity).map(_._2.length.toLong)
    def qln(x: Long) = math.floor(math.log(x.toDouble) * 1e9).toLong
    val nTr = counts.sum
    val entQ = nTr * qln(nTr) - counts.map(c => c * qln(c)).sum
    assert(top.head.getLong(1) === nTr)
    assert(top.head.getLong(2) === counts.size.toLong)
    assert(top.head.getLong(3) === entQ)
  }
}

class FeatureStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming lag features equal the batch window query row for row") {
    val dir = "/root/testdata/sf0.01"
    val streamed = streaming.FeatureStream.runToResult(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q_events_lag_features")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("feature state stays bounded at 3 ring values regardless of history") {
    // pure fold check on the state contract: feed 10 events, ring ≤ 3
    var st = streaming.FeatureStream.FeatState(-1L, Nil)
    (1L to 10L).foreach { i =>
      st = streaming.FeatureStream.FeatState(i * 1000L, (st.ring :+ i).takeRight(3))
    }
    assert(st.ring === Seq(8L, 9L, 10L) && st.ring.length === 3)
  }
}

class BitmapRetentionSpec extends AnyFunSuite {
  import TestSpark._

  test("bitmap DAU/WAU equal set-based distinct counts recomputed in the driver") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_events_bitmap_retention")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dayNs = 86400000000000L
    val pairs = Tables.events(spark, dir)
      .selectExpr(s"ts_ns div $dayNs as day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byDay = pairs.groupBy(_._1)
    assert(rows.keySet === byDay.keySet)
    byDay.foreach { case (d, dayPairs) =>
      val dau = dayPairs.map(_._2).size.toLong
      val wau = pairs.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2).size.toLong
      assert(rows(d) === ((dau, wau)), s"day $d")
    }
  }
}

class SampRecencySpec extends AnyFunSuite {
  import TestSpark._

  test("recency sampling: floor respected, decay monotone, realized near target") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("samp_recency")(spark, dir).collect()
    assert(rows.nonEmpty)
    val targets = rows.map(_.getLong(3))
    assert(targets.forall(_ >= 100L))
    // target decays (non-strictly) with age week
    assert(targets.toSeq === targets.sortBy(-_).toSeq)
    // realized keep rate within ±15% of the bucket's max target on
    // buckets big enough for the hash to average out
    rows.filter(_.getLong(1) >= 500).foreach { r =>
      assert(math.abs(r.getLong(4) - r.getLong(3)) <= 150,
        s"week ${r.getLong(0)}: realized ${r.getLong(4)} vs target ${r.getLong(3)}")
    }
    // determinism: a second run is bit-identical (pure hash, no RNG)
    val again = SparkEntry.queries("samp_recency")(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}

class LatenessAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("lateness histogram reconciles with the synthetic 5% delay gate") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_events_lateness_audit")(spark, dir).collect()
    val nTotal = rows.map(_.getLong(1)).sum
    val ev = Tables.events(spark, dir)
    assert(nTotal === ev.count())
    // only gate-delayed events can be late; some delayed ones are still
    // on time (no newer event overtook them), so late <= delayed
    val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Mix64Long(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("event_id"))))
    val nDelayed = ev.where(shiftrightunsigned(h, 32) % 20L === 0L).count()
    val nLate = rows.filter(_.getLong(0) > 0).map(_.getLong(1)).sum
    assert(nLate > 0 && nLate <= nDelayed)
    // cumulative permille is monotone and ends at exactly 1000
    val cums = rows.map(_.getLong(2))
    assert(cums.toSeq === cums.sorted.toSeq && cums.last === 1000L)
    // 48h delay = at most 8 six-hour buckets
    assert(rows.map(_.getLong(0)).max <= 8L)
  }
}

class DegreeDistSpec extends AnyFunSuite {
  import TestSpark._

  test("degree histogram matches a driver-side recompute; buckets hold their range") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_graph_degree_dist")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn >= (1L << b.toInt) && mx < (1L << (b.toInt + 1)) && mn <= mx)
    }
    // independent recompute of node degrees from the pair query's edges
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = li.groupBy(_._1).values
    val edges = byOrder.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map(_._2.length.toLong)
    val expected = deg.groupBy(d => (63 - java.lang.Long.numberOfLeadingZeros(d)).toLong)
      .map { case (b, ds) => b -> (ds.size.toLong, ds.min, ds.max) }
    val got = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }
}

class BpeMergesSpec extends AnyFunSuite {
  import TestSpark._

  test("first BPE merge matches a driver-side recompute of the top pair") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("text_bpe_merges")(spark, dir).collect()
    assert(rows.length === 4)
    val wc = Tables.documents(spark, dir)
      .select(explode(text.Text.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
    wc.foreach { case (w, n) =>
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + n
      }
    }
    val (bestPair, bestC) =
      pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
    assert(rows(0).getString(1) === bestPair._1 + bestPair._2)
    assert(rows(0).getLong(2) === bestC)
    // merge weights never increase across steps (greedy argmax each round)
    assert(rows(0).getLong(2) >= rows(1).getLong(2))
    // vocab row: merges add at most 3 tokens over the character alphabet
    val alphabet = wc.map(_._1).flatMap(_.toSeq).distinct.length.toLong
    assert(rows(3).getString(1) === "<vocab>" && rows(3).getLong(2) <= alphabet + 3)
  }

  test("delimiter-string replace implements greedy left-to-right non-overlapping merge") {
    // the cross-engine representation contract: JVM String.replace must
    // merge 'aaa' as [aa, a], never the overlapping [a, aa]
    assert("|a||a||a|".replace("|a||a|", "|aa|") === "|aa||a|")
    assert("|x||a||b||a||b|".replace("|a||b|", "|ab|") === "|x||ab||ab|")
  }
}

class ConversionLagSpec extends AnyFunSuite {
  import TestSpark._

  test("conversion lag reconciles: converters + never-converted = signup users") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_events_conversion_lag")(spark, dir).collect()
    val (never, histo) = rows.partition(_.getLong(0) == -1L)
    assert(never.length === 1)
    val nConv = histo.map(_.getLong(1)).sum
    val ev = Tables.events(spark, dir)
    val nSignup = ev.where(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(nConv + never.head.getLong(1) === nSignup)
    // cumulative permille monotone, ends at 1000 over converters
    val cums = histo.filter(!_.isNullAt(2)).map(_.getLong(2))
    assert(cums.toSeq === cums.sorted.toSeq && cums.last === 1000L)
    // spot-check the head bucket: users whose first purchase lands on
    // the signup day, recomputed independently
    val su = ev.where(col("event_type") === "signup").groupBy("user_id")
      .agg(min("ts_ns").as("sn")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pu = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts_ns").collect().groupBy(_.getLong(0))
    val day0 = su.count { case (u, sn) =>
      pu.get(u).exists { ps =>
        val after = ps.map(_.getLong(1)).filter(_ >= sn)
        after.nonEmpty && (after.min - sn) / 86400000000000L == 0L
      }
    }
    assert(histo.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L) === day0.toLong)
  }
}

class LateShipmentSpec extends AnyFunSuite {
  import TestSpark._

  test("Q4 shape: semi join counts orders once regardless of late-lineitem multiplicity") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_late_shipment_priority")(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent recompute: distinct qualifying orders via inner join
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val direct = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap === direct)
    // plan: residual rides the hash join, no cartesian/BNLJ
    val plan = SparkEntry.queries("q_late_shipment_priority")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && !plan.contains("CartesianProduct"), plan.take(500))
    spark.catalog.clearCache()
  }
}

class CountDistSpec extends AnyFunSuite {
  import TestSpark._

  test("Q13 shape: zero-order customers included; distribution mass reconciles") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_order_count_dist")(spark, dir).collect()
    val nCust = Tables.customer(spark, dir).count()
    val nOrders = Tables.orders(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum === nCust)        // every customer lands somewhere
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === nOrders) // mass conserved
  }
}

class SmallQtySpec extends AnyFunSuite {
  import TestSpark._

  test("Q17 shape: integer cross-multiplied threshold equals the float-average filter") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("q_small_qty_revenue")(spark, dir).collect()(0)
    // independent recompute with a per-part double average
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .collect().groupBy(_.getLong(0))
    var rev = 0L; var n = 0L
    li.values.foreach { items =>
      val avg = items.map(_.getDouble(1)).sum / items.length
      items.foreach { it =>
        if (it.getDouble(1) < 0.2 * avg) {
          rev += math.round(it.getDouble(2) * 100); n += 1
        }
      }
    }
    assert(r.getLong(1) === n)
    assert(r.getLong(0) === rev)
  }
}

class BitmapStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming bitmap DAU equals the batch bitmap-retention DAU column") {
    val dir = "/root/testdata/sf0.01"
    val streamed = streaming.BitmapStream.dauFromStream(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = SparkEntry.queries("q_events_bitmap_retention")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("bitmap fold is associative and idempotent (replay-safe merge law)") {
    val bits = Seq(1L << 3, 1L << 17, 1L << 3, 1L << 61)
    val once = bits.foldLeft(0L)(_ | _)
    val split = bits.take(2).foldLeft(0L)(_ | _) | bits.drop(2).foldLeft(0L)(_ | _)
    val replayed = (bits ++ bits).foldLeft(0L)(_ | _)
    assert(once === split && once === replayed)
    assert(java.lang.Long.bitCount(once) === 3)
  }
}

class BinaryFileSpec extends AnyFunSuite {
  import TestSpark._

  test("binaryFile scan fingerprints match direct java.nio reads and DuckDB read_blob") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("src_binaryfile_scan")(spark, dir).collect()
    assert(rows.length === new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")))
    rows.foreach { r =>
      val f = java.nio.file.Paths.get(dir, r.getString(0))
      val bytes = java.nio.file.Files.readAllBytes(f)
      assert(r.getLong(1) === bytes.length.toLong)
      def hex(bs: Array[Byte]) = bs.map(b => f"${b & 0xff}%02X").mkString
      assert(r.getString(2) === hex(bytes.take(8)))
      assert(r.getString(3) === hex(bytes.takeRight(8)))
      // parquet magic at both ends — the bytes really arrived
      assert(r.getString(2).startsWith("50415231"))
      assert(r.getString(3).endsWith("50415231"))
    }
  }
}

class GiniSpec extends AnyFunSuite {
  import TestSpark._

  test("Gini permille matches a driver-side recompute and sits in (0, 1000)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("q_orders_gini")(spark, dir).collect()(0)
    val revs = Tables.orders(spark, dir).groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1) / 100L))
      .sortBy(x => (x._2, x._1)).map(_._2)
    val n = revs.length.toLong
    val sumU = revs.sum
    val sumIU = revs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === 2 * sumIU - (n + 1) * sumU)
    assert(r.getLong(2) === n * sumU)
    val pml = r.getLong(3)
    assert(pml === r.getLong(1) * 1000 / r.getLong(2))
    assert(pml > 0 && pml < 1000)
  }
}

class TpchTradeSpec extends AnyFunSuite {
  import TestSpark._

  private val sf01 = "/root/testdata/sf0.01"

  test("Q7 shape: both trade directions present; revenue reconciles per direction") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_nation_trade")(spark, sf01).collect()
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs === Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18")))
    // independent recompute of one direction's total
    val n = Tables.nation(spark, sf01)
    val k1 = n.where(col("n_name") === "NATION_18").head().getAs[Number](0).longValue()
    val k2 = n.where(col("n_name") === "NATION_19").head().getAs[Number](0).longValue()
    val direct = Tables.lineitem(spark, sf01)
      .join(Tables.orders(spark, sf01), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sf01).where(col("s_nationkey") === k1),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, sf01).where(col("c_nationkey") === k2),
        col("o_custkey") === col("c_custkey"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))))
      .head().getLong(0)
    val got = rows.filter(r => r.getString(0) == "NATION_18").map(_.getLong(3)).sum
    assert(got === direct)
  }

  test("Q16 shape: deficit suppliers excluded from every distinct count") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_part_supplier_count")(spark, sf01).collect()
    assert(rows.length === 20 && rows.forall(_.getLong(3) > 0))
    val badKeys = Tables.supplier(spark, sf01).where(col("s_acctbal") < 0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(badKeys.nonEmpty) // the exclusion actually bites on this data
    // recompute the top row's count excluding deficit suppliers
    val r0 = rows.head
    val cnt = Tables.lineitem(spark, sf01)
      .join(Tables.part(spark, sf01).where(col("p_brand") === r0.getString(0) &&
        col("p_type") === r0.getString(1) && col("p_size") === r0.getInt(2)),
        col("l_partkey") === col("p_partkey"))
      .select("l_suppkey").distinct().collect().map(_.getLong(0))
      .count(k => !badKeys(k)).toLong
    assert(r0.getLong(3) === cnt)
  }

  test("Q22 shape: dormant = above-average balance and no recent order") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_dormant_customers")(spark, sf01).collect()
    assert(rows.nonEmpty)
    // driver recompute: threshold over positive balances, then recency anti
    val bals = Tables.customer(spark, sf01)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100, 0).cast("long").as("b"))
      .collect()
    val pos = bals.map(_.getLong(2)).filter(_ > 0)
    val (s, n) = (pos.sum, pos.length.toLong)
    val recent = Tables.orders(spark, sf01)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val expected = bals.filter(r => r.getLong(2) * n > s && !recent(r.getLong(0)))
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap === expected)
  }
}

class MarketShareSpec extends AnyFunSuite {
  import TestSpark._

  test("Q8 shape: share permille bounded; totals reconcile with the Q5-family join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_market_share")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))            // numerator within total
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000)
      assert(r.getLong(3) === r.getLong(1) * 1000 / r.getLong(2))
    }
  }

  test("Q21 shape: every reported order count reconciles with a driver recompute") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_sole_late_supplier")(spark, dir).collect()
    assert(rows.nonEmpty)
    // driver-side recompute of the sole-late classification
    val joined = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
      .collect()
    val perOrder = joined.groupBy(_.getLong(0)).view.mapValues { items =>
      val bySupp = items.groupBy(_.getLong(1)).view.mapValues(_.exists(_.getBoolean(2)))
      (bySupp.size, bySupp.filter(_._2).keys.toSeq.sorted)
    }
    val expected = perOrder.values
      .collect { case (nSupp, late) if nSupp >= 2 && late.length == 1 => late.head }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach(r => assert(expected(r.getLong(0)) === r.getLong(1), s"supp ${r.getLong(0)}"))
    // the limit-20 is the head of the full ranking
    val top = expected.toSeq.sortBy { case (k, v) => (-v, k) }.take(rows.length)
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toSeq === top)
  }
}

class ForecastRevenueSpec extends AnyFunSuite {
  import TestSpark._

  test("Q6 shape: range predicates reach the parquet scan; scan reads 4 columns") {
    val dir = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("q_forecast_revenue")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the rendered PushedFilters list truncates after ~100 chars, so
    // assert on the filters that fit the window (shipdate range leads)
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_shipdate"), plan.take(900))
    val reads = "ReadSchema: ([^\\n]*)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.exists(_.contains("l_discount")) &&
      reads.forall(s => !s.contains("l_orderkey")), reads.mkString("; "))
    val r = df.collect()(0)
    assert(r.getLong(1) > 0 && r.getLong(0) > 0)
    spark.catalog.clearCache()
  }
}

class EpochShuffleSpec extends AnyFunSuite {
  import TestSpark._

  test("epoch re-deal: counts conserve, shards differ across epochs, reruns bit-identical") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("pipe_epoch_shuffle")(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    Seq(0L, 1L).foreach { ep =>
      val mine = rows.filter(_.getLong(0) == ep)
      assert(mine.map(_.getLong(2)).sum === nDocs)       // every doc dealt
      assert(mine.map(_.getLong(1)).toSet.size >= 6)     // shards actually used
    }
    // the re-deal is epoch-sensitive: per-shard doc-id sums differ
    val byEpoch = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(r => r.getLong(1) -> r.getLong(3)).toMap)
    assert(byEpoch(0L) !== byEpoch(1L))
    // determinism: a second run is bit-identical (pure hash, no RNG)
    val again = SparkEntry.queries("pipe_epoch_shuffle")(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}

class KhopSpec extends AnyFunSuite {
  import TestSpark._

  test("k-hop BFS matches a driver-side breadth-first search") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_graph_khop")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver BFS over the same edge list
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    li.groupBy(_._1).values.foreach { ps =>
      val parts = ps.map(_._2).distinct
      for (x <- parts; y <- parts if x != y) adj(x) = adj(x) + y
    }
    val seed = adj.toSeq.map { case (n, ns) => (n, ns.size) }
      .minBy { case (n, d) => (-d, n) }._1
    var visited = Map(seed -> 0L)
    var frontier = Set(seed)
    for (h <- 1L to 3L) {
      val next = frontier.flatMap(adj).diff(visited.keySet)
      visited ++= next.map(_ -> h)
      frontier = next
    }
    val expected = visited.values.groupBy(identity).map { case (h, xs) => h -> xs.size.toLong }
    assert(rows === expected)
    assert(rows(0L) === 1L) // the seed itself
  }
}

class LshRecallSpec extends AnyFunSuite {
  import TestSpark._

  test("recall evals expose the LSH-vs-IVF asymmetry on the same truth set") {
    val dir = "/root/testdata/sf0.01"
    val lsh = SparkEntry.queries("ann_lsh_recall")(spark, dir).collect()
    val ivf = SparkEntry.queries("ann_recall_eval")(spark, dir).collect()
    assert(lsh.length === 5 && ivf.length === 5)
    lsh.foreach(r => assert(r.getLong(1) === 10L && r.getLong(2) <= 10L))
    // the measured finding: single-probe sign-LSH recalls strictly less
    // than IVF on every query here — the eval pair must preserve that
    val lshTotal = lsh.map(_.getLong(2)).sum
    val ivfTotal = ivf.map(_.getLong(2)).sum
    assert(lshTotal < ivfTotal, s"lsh $lshTotal vs ivf $ivfTotal")
    // permille arithmetic is the exact truncating division
    (lsh ++ ivf).foreach(r => assert(r.getLong(3) === r.getLong(2) * 1000 / r.getLong(1)))
  }
}

class QuantileSketchSpec extends AnyFunSuite {
  import TestSpark._

  test("histogram median estimate stays within the log-grid error bound") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_quantile_sketch")(spark, dir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      // bucket width is a factor e^(1/8) ~ 1.133, so the midpoint of the
      // straddling bucket is within ~14% of any value inside it
      assert(r.getDouble(4) < 0.14, s"${r.getString(0)}: rel_err ${r.getDouble(4)}")
      assert(r.getLong(2) > 0 && r.getDouble(3) > 0)
    }
  }

  test("the log-grid histogram is mergeable by plain addition") {
    // per-shard sketches combine with count addition and min/max fold —
    // the property that makes this the distributed-quantile shape
    case class B(n: Long, mn: Long, mx: Long)
    def merge(a: B, b: B) = B(a.n + b.n, math.min(a.mn, b.mn), math.max(a.mx, b.mx))
    val shard1 = Map(3L -> B(10, 21, 27), 4L -> B(5, 30, 40))
    val shard2 = Map(4L -> B(7, 28, 44), 5L -> B(2, 50, 55))
    val merged = (shard1.keySet ++ shard2.keySet).map { k =>
      k -> (shard1.get(k), shard2.get(k)) match {
        case (k2, (Some(a), Some(b))) => k2 -> merge(a, b)
        case (k2, (Some(a), None)) => k2 -> a
        case (k2, (None, Some(b))) => k2 -> b
        case (k2, (None, None)) => k2 -> B(0, 0, 0)
      }
    }.toMap
    assert(merged(4L) === B(12, 28, 44)) // counts add, extents fold
    assert(merged(3L) === B(10, 21, 27) && merged(5L) === B(2, 50, 55))
  }
}

class RefIntegritySpec extends AnyFunSuite {
  import TestSpark._

  test("clean star schema audits to zero orphans; a planted orphan is caught") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_ref_integrity")(spark, dir).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L, r.getString(0))
    }
    // negative control: the same anti-join construction flags a planted
    // orphan (drop a parent key, its children must surface)
    val victim = Tables.orders(spark, dir).select("o_orderkey").head().getLong(0)
    val parents = Tables.orders(spark, dir).where(col("o_orderkey") =!= victim)
    val orphans = Tables.lineitem(spark, dir).select("l_orderkey")
      .join(parents.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    val n = orphans.count()
    val expected = Tables.lineitem(spark, dir)
      .where(col("l_orderkey") === victim).count()
    assert(n === expected && n > 0)
  }
}

class RevenueTrendSpec extends AnyFunSuite {
  import TestSpark._

  test("integer trend matches a driver-side regression; forecast is the line at x=n") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("q_revenue_trend")(spark, dir).collect()(0)
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .agg((sum(round(col("o_totalprice") * 100, 0).cast("long")) / 100).cast("long").as("y"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).sortBy(_._1)
    val n = monthly.length.toLong
    val ys = monthly.map(_._2)
    val xs = (0L until n).toArray
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === slope)
    assert(r.getLong(2) === intercept)
    assert(r.getLong(3) === intercept + slope * n)
  }
}

class BacklogAgingSpec extends AnyFunSuite {
  import TestSpark._

  test("backlog bands cover every open order; values reconcile") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_orders_backlog_aging")(spark, dir).collect()
    assert(rows.nonEmpty)
    val open = Tables.orders(spark, dir).where(col("o_orderstatus") === "O")
    assert(rows.map(_.getLong(1)).sum === open.count())
    val totalV = open.agg(sum(round(col("o_totalprice") * 100, 0).cast("long")))
      .head().getLong(0)
    assert(rows.map(_.getLong(2)).sum === totalV)
    // bands are non-negative and contiguous from 0 is NOT required
    // (months with no open orders are legal), but the newest band must
    // exist: some order is within 30 days of the watermark
    assert(rows.map(_.getLong(0)).min === 0L)
  }
}

class Wave3Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("top supplier carries the exact max revenue over the quarter") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_top_supplier")(spark, dir).collect()
    assert(rows.nonEmpty)
    // recompute independently: per-supplier quarter revenue in cent-percent
    val rev = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("r"))
    val mx = rev.agg(max("r")).head().getLong(0)
    assert(rows.forall(_.getLong(2) == mx))
    // every supplier at the max is present (tie semantics)
    assert(rows.length === rev.where(col("r") === mx).count())
  }

  test("product profit conserves the filtered-part revenue mass") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q_product_profit")(spark, dir)
    val total = out.agg(sum("profit_cp"), sum("n_items")).head()
    val base = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).where(col("p_name").contains("bolt"))
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))),
        count(lit(1))).head()
    // every filtered lineitem lands in exactly one (nation, year) cell:
    // the FK joins (orders, supplier, nation) must not drop or fan out
    assert(total.getLong(0) === base.getLong(0))
    assert(total.getLong(1) === base.getLong(1))
  }

  test("hard negatives never share the query's label and rank by cosine") {
    val out = SparkEntry.queries("vec_hard_negatives")(spark, dir)
    val lbl = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val joined = out
      .join(lbl.withColumnRenamed("label", "nlabel"), Seq("vec_id"))
      .join(lbl.select(col("vec_id").as("query_id"), col("label").as("qlabel")),
        Seq("query_id"))
    assert(joined.where(col("nlabel") === col("qlabel")).count() === 0L)
    // per query: ranks are 1..k and cosine is non-increasing in rank
    val bad = out.selectExpr("query_id", "rnk", "cosine")
      .withColumn("prev", lag("cosine", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy("rnk")))
      .where(col("prev").isNotNull && col("prev") < col("cosine"))
    assert(bad.count() === 0L)
  }

  test("hapax ratio invariants: hapax <= types <= tokens, mass conserved") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("text_hapax_ratio")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, tokens, hapax) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hapax <= types && types <= tokens)
      assert(r.getLong(4) === types * 1000 / tokens)
      assert(r.getLong(5) === hapax * 1000 / types)
    }
    val totalTokens = Tables.documents(spark, dir)
      .agg(sum(text.Text.wordCount(col("text")))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum === totalTokens)
  }

  test("vocab growth: cumulative, ends at corpus totals, vocab sublinear") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("text_vocab_growth")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
    val last = rows.last
    val words = Tables.documents(spark, dir)
      .select(explode(text.Text.words(col("text"))).as("w"))
    assert(last.getLong(1) === words.count())
    assert(last.getLong(2) === words.distinct().count())
    // strictly cumulative in tokens; vocab non-decreasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) > a.getLong(1) && b.getLong(2) >= a.getLong(2))
      case _ => ()
    }
  }
}

class Wave4Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("prototypes: <=3 per cell, contiguous ranks, central-first") {
    val rows = SparkEntry.queries("samp_prototypes")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_.getLong(0))
    byCell.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq)
      val cos = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // prototypes are distinct vectors
    assert(rows.map(_.getLong(1)).distinct.length === rows.length)
  }

  test("langid confusion matrix aggregates the per-doc predictions") {
    val m = SparkEntry.queries("text_langid_eval")(spark, dir)
    val perDoc = Tables.documents(spark, dir)
      .select(col("lang"), text.Text.langId(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    assert(m.collect().map(_.toSeq).toSet === perDoc.collect().map(_.toSeq).toSet)
    assert(m.agg(sum("n")).head().getLong(0) ===
      Tables.documents(spark, dir).count())
  }

  test("cohort LTV conserves order count and revenue; curves are cumulative") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q_orders_cohort_ltv")(spark, dir)
    val rows = out.collect()
    val orders = Tables.orders(spark, dir)
    assert(rows.map(_.getLong(3)).sum === orders.count())
    assert(rows.map(_.getLong(4)).sum ===
      orders.agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))).head().getLong(0))
    assert(rows.forall(_.getLong(2) >= 0L)) // age never negative
    // every cohort has its own age-0 cell and cum matches the running sum
    rows.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (_, rs) =>
      val s = rs.sortBy(_.getLong(2))
      assert(s.head.getLong(2) === 0L)
      assert(s.map(_.getLong(4)).scanLeft(0L)(_ + _).tail.toSeq ==
        s.map(_.getLong(5)).toSeq)
    }
  }

  test("margin eval's impostor side equals the top hard negative") {
    val m = SparkEntry.queries("vec_margin_eval")(spark, dir)
      .select("query_id", "neg_u6", "pos_u6", "margin_u6").collect()
    assert(m.length === 5)
    val hn1 = SparkEntry.queries("vec_hard_negatives")(spark, dir)
      .where(col("rnk") === 1)
      .select(col("query_id"), round(col("cosine") * 1e6, 0).cast("long").as("u6"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    m.foreach { r =>
      assert(r.getLong(1) === hn1(r.getLong(0)))
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
      assert(math.abs(r.getLong(2)) <= 1000000L && math.abs(r.getLong(1)) <= 1000000L)
    }
  }

  test("supplier lead time: item mass conserved, quantile ordering holds") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_supplier_lead_time")(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.lineitem(spark, dir).count())
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getLong(4).toDouble)
    }
  }
}

class Wave5Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("audio features align with the envelope windows; integer invariants") {
    val feat = SparkEntry.queries("mm_audio_features")(spark, dir)
      .select(col("doc_id"), col("win"), col("n_samples").as("ns_f"),
        col("energy"), col("zero_cross"))
    val env = SparkEntry.queries("mm_audio_envelope")(spark, dir)
      .select(col("doc_id"), col("win"), col("n_samples").as("ns_e"),
        col("abs_sum"))
    val j = feat.join(env, Seq("doc_id", "win"), "full_outer")
    // identical window partitioning out of both decode passes
    assert(j.where(col("ns_f") =!= col("ns_e") ||
      col("ns_f").isNull || col("ns_e").isNull).count() === 0L)
    // d integer => d^2 >= |d|, so energy dominates the envelope sum;
    // crossings are bounded by within-window neighbor pairs
    val bad = j.where(col("energy") < col("abs_sum") ||
      col("zero_cross") > col("ns_f") - 1 || col("energy") < 0)
    assert(bad.count() === 0L)
  }

  test("ngram novelty: first doc fully novel, novel mass = distinct grams") {
    val rows = SparkEntry.queries("text_ngram_novelty")(spark, dir).collect()
    assert(rows.nonEmpty)
    // the lowest doc_id with any grams owns all its grams
    assert(rows.minBy(_.getLong(0)).getLong(3) === 1000L)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // every distinct gram is novel in exactly one doc
    val distinctGrams = Tables.documents(spark, dir)
      .select(explode(text.Text.shingles(col("text"), 5)).as("g"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum === distinctGrams)
  }

  test("migration matrix counts every consecutive-year customer pair once") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q_customer_migration")(spark, dir)
    val annual = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n"))
    val pairs = annual.as("a").join(annual.as("b"),
      col("a.o_custkey") === col("b.o_custkey") &&
        col("a.yr") === col("b.yr") - 1).count()
    assert(out.agg(sum("n_customers")).head().getLong(0) === pairs)
    val bands = out.select("band_from", "band_to").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bands.forall { case (f, t) => f >= 0 && f <= 3 && t >= 0 && t <= 3 })
  }
}

class Wave6Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("fertility report aggregates the per-doc token counts exactly") {
    val rep = SparkEntry.queries("pipe_tokenizer_fertility")(spark, dir).collect()
    assert(rep.nonEmpty)
    val perDoc = SparkEntry.queries("text_tokens")(spark, dir)
      .agg(sum("ws_tokens"), sum("bpe_tokens")).head()
    assert(rep.map(_.getLong(2)).sum === perDoc.getLong(0))
    assert(rep.map(_.getLong(3)).sum === perDoc.getLong(1))
    // a BPE-ish token never spans a whitespace word: fertility >= 1
    rep.foreach(r => assert(r.getLong(4) >= 1000L))
  }

  test("norm audit covers every vector; outliers respect the MAD gate") {
    val rows = SparkEntry.queries("vec_norm_audit")(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.embeddings(spark, dir).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))       // min <= max
      assert(r.getLong(4) <= r.getLong(1))       // outliers <= members
    }
  }
}

class Wave7Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("scene cuts agree with the declared frame counts; deltas bounded") {
    val rows = SparkEntry.queries("mm_scene_cuts")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nf, cuts, maxD) = (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
      assert(nf === 2 + (id % 3).toInt)      // formula frame count survived the codec
      assert(cuts <= nf - 1)                  // at most one cut per frame pair
      assert(maxD >= 0 && maxD <= 255000)     // milli-gray mean delta bounds
      if (cuts > 0) assert(maxD > 8000)       // a cut implies a supra-threshold delta
    }
  }

  test("retention sweep physically removes expired partitions") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("snk_retention_sweep")(spark, dir).collect()
    assert(out.nonEmpty)
    // nothing before the cutoff survives a full unfiltered re-read
    assert(out.forall(_.getLong(0) >= 1998L))
    // surviving years carry exactly the source's counts
    val expect = Tables.orders(spark, dir)
      .where(year(col("o_orderdate")) >= 1998)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap === expect)
  }
}

class Wave8Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("bot score: a planted metronome user outranks organic traffic") {
    import spark.implicits._
    val tmp = TmpDirs.create("bot")
    // organic: pseudo-random gaps; metronome: exact 1s cadence
    val organic = (1 to 40).map { i =>
      (100L + i, 9000L, (1 to 30).scanLeft(0L)((t, j) => t + 500000L + ((i * 7919L + j * 104729L) % 1500000L)))
    }.flatMap { case (u, _, ts) => ts.map(t => (u, t)) }
    val bot = (1 to 30).map(j => (7L, j * 1000000L))
    val ev = (organic ++ bot).zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t * 1000L) }
      .toDF("event_id", "user_id", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // reuse the documents/embeddings-free key directly against the scratch dir
    val out = SparkEntry.queries("q_events_bot_score")(spark, tmp).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(0) === 7L)               // metronome ranks first
    assert(out.head.getLong(3) === 1000L)            // perfectly regular
    // organic users never reach perfect regularity — and they exist
    // (non-vacuous: the report must rank organics below the metronome)
    assert(out.count(_.getLong(0) != 7L) > 0)
    assert(out.filter(_.getLong(0) != 7L).forall(_.getLong(3) < 1000L))
  }

  test("schema evolution: old generation surfaces NULL for the new column") {
    val out = SparkEntry.queries("src_schema_evolution")(spark, dir)
    val n = Tables.nation(spark, dir).count()
    assert(out.count() === 2 * n)
    assert(out.where(col("gen") === 1 && col("n_regionkey").isNotNull).count() === 0L)
    assert(out.where(col("gen") === 2 && col("n_regionkey").isNull).count() === 0L)
  }
}

class Wave9Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("peak concurrency: planted burst of k overlapping windows yields peak k") {
    import spark.implicits._
    val tmp = TmpDirs.create("conc")
    // 7 events within one second (all overlap), plus 5 isolated events
    // each on its OWN DAY (>86400s apart) so the day>0 non-stacking
    // assertion below actually matches rows
    val burst = (0 until 7).map(i => (i.toLong, 1000000L + i * 100000L))
    val lone = (0 until 5).map(i => (100L + i, 86400000000L * (i + 1) + 1000000L))
    val ev = (burst ++ lone).map { case (id, us) => (id, 5L, us * 1000L) }
      .toDF("event_id", "user_id", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q_events_peak_concurrency")(spark, tmp).collect()
    assert(out.map(_.getLong(1)).max === 7L)
    // the peak is first reached when the burst's last window opens
    val day0 = out.filter(_.getLong(0) === 0L).head
    assert(day0.getLong(2) === 1000000L + 6 * 100000L)
    // isolated windows never stack — and the filter is non-vacuous:
    // all 5 lone days are present
    assert(out.count(_.getLong(0) > 0L) === 5)
    assert(out.filter(_.getLong(0) > 0L).forall(_.getLong(1) === 1L))
  }

  test("code score flags brace-dense text, not prose") {
    import spark.implicits._
    val code = "int f(){int x=1;if(x<2){x=3;}return x;}"
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((0L, code, "en", "srcA", code.length),
      (1L, prose, "en", "srcB", prose.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = TmpDirs.create("code")
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("text_code_score")(spark, tmp)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("srcA").getLong(4) === 1L)   // flagged
    assert(out("srcB").getLong(4) === 0L)
    assert(out("srcA").getLong(3) > out("srcB").getLong(3))
  }
}

class UnpivotSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("pivot then unpivot reproduces the plain sparse aggregate") {
    val dir = "/root/testdata/sf0.01"
    val long = SparkEntry.queries("q_unpivot_api")(spark, dir)
    val plain = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), year(to_date(col("o_orderdate"))).cast("long").as("yr"))
      .where(col("yr").between(1995, 1998))
      .groupBy("o_orderpriority", "yr").agg(count(lit(1)).as("n"))
    assert(long.collect().map(_.toSeq).toSet === plain.collect().map(_.toSeq).toSet)
  }
}

class ActiveTimeSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("interval union never double-counts overlap and caps at window span") {
    import spark.implicits._
    val tmp = TmpDirs.create("act")
    // user 1: 3 windows inside one 5-min span -> union = span + small tail
    // user 2: two disjoint windows -> union = exactly 2 spans
    val ev = Seq(
      (0L, 1L, 1000000L), (1L, 1L, 2000000L), (2L, 1L, 3000000L),
      (3L, 2L, 1000000L), (4L, 2L, 2000000000L))
      .map { case (id, u, us) => (id, u, us * 1000L) }
      .toDF("event_id", "user_id", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q_events_active_time")(spark, tmp).collect()
    assert(out.length === 1)
    val span = 300000000L
    // user 1: [1s, 3s+300s) = span + 2s; user 2: 2 disjoint spans
    assert(out.head.getLong(1) === (span + 2000000L) + 2 * span)
    assert(out.head.getLong(2) === 2L)
    assert(out.head.getLong(3) === 2 * span)
  }
}

class BotStreamSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("online fold: metronome pins 1000 permille; jitter degrades it") {
    var st = streaming.BotStream.BotState(-1L, 0L, 0L, 0L)
    (0 until 20).foreach { i =>
      val (next, scored) = streaming.BotStream.step(st, i * 1000000L)
      st = next
      scored.foreach { case (_, pml) => assert(pml === 1000L) }
    }
    assert(st.n === 19L && st.near === 19L)
    // a wild outlier gap is not near; score drops below 1000
    val (st2, scored2) = streaming.BotStream.step(st, st.lastUs + 50L * 1000000L)
    assert(scored2.get._2 < 1000L && st2.near === st.near)
  }

  test("streaming scores cover every gap the batch side sees") {
    val streamed = streaming.BotStream.runToResult(spark, dir)
    assert(streamed.count() > 0)
    val lastPerUser = streamed.groupBy("user_id")
      .agg(max("n_gaps").as("n_gaps"))
    val batchGaps = Tables.events(spark, dir)
      .groupBy("user_id").agg((count(lit(1)) - 1).as("expect"))
      .where(col("expect") > 0)
    val j = lastPerUser.join(batchGaps, Seq("user_id"), "full_outer")
    assert(j.where(col("n_gaps") =!= col("expect") ||
      col("n_gaps").isNull || col("expect").isNull).count() === 0L)
  }
}

class MinCostSupplierSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("every size-5 part with an ASIA shipper appears, at its true min") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q_min_cost_supplier")(spark, dir)
    // recompute eligibility independently
    val asia = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), round(col("s_acctbal") * 100, 0).cast("long").as("c"))
    val el = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey").distinct()
      .join(Tables.part(spark, dir).where(col("p_size") === 5).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(asia, col("l_suppkey") === col("s_suppkey"))
    val expectParts = el.select("p_partkey").distinct().count()
    assert(out.select("p_partkey").distinct().count() === expectParts)
    // each output row carries its part's true minimum
    val mins = el.groupBy("p_partkey").agg(min("c").as("true_min"))
    val bad = out.join(mins, Seq("p_partkey"))
      .where(col("cost_c") =!= col("true_min"))
    assert(bad.count() === 0L)
  }
}

class RobustIngestSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("malformed CSV: corrupt rows counted, clean rows intact") {
    val rows = SparkEntry.queries("src_csv_malformed")(spark, dir).collect()
    val n = Tables.nation(spark, dir).count()
    val corrupt = rows.filter(_.getString(3) == "corrupt_count")
    assert(corrupt.length === 1)
    val expectBad = Tables.nation(spark, dir)
      .where(col("n_nationkey") % 5 === 0).count()
    assert(corrupt.head.getLong(0) === expectBad)
    assert(rows.count(_.getString(3) == "clean") === n - expectBad)
  }

  test("replay with intact marker is a no-op; every key exactly once") {
    val out = SparkEntry.queries("snk_idempotent_append")(spark, dir)
    assert(out.where(col("n_copies") =!= 1L).count() === 0L)
    assert(out.count() === Tables.nation(spark, dir).count())
  }

  test("crash window: replay after a lost marker re-appends (at-least-once)") {
    val tmp = TmpDirs.create("idemcrash")
    val batch = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name"))
    assert(sinks.IdempotentAppend.append(batch, s"$tmp/t", "r1"))
    // simulate a crash between data write and marker commit
    assert(new java.io.File(s"$tmp/t/_committed_r1").delete())
    assert(sinks.IdempotentAppend.append(batch, s"$tmp/t", "r1")) // re-runs
    val copies = spark.read.parquet(s"$tmp/t")
      .groupBy("k").count().select("count").distinct().collect()
    assert(copies.map(_.getLong(0)).toSet === Set(2L)) // documented at-least-once
    // a FRESH run id is unaffected by r1's history
    assert(sinks.IdempotentAppend.append(batch, s"$tmp/t", "r2"))
    assert(!sinks.IdempotentAppend.append(batch, s"$tmp/t", "r2"))
  }
}

class SetNullSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("set ops partition 1996 actives into retained + churned exactly") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q_set_ops")(spark, dir)
    val y96 = Tables.orders(spark, dir)
      .where(year(col("o_orderdate")) === 1996)
      .select("o_custkey").distinct().count()
    // retained + churned = 1996 actives, and the two cohorts are disjoint
    assert(out.count() === y96)
    assert(out.select("o_custkey").distinct().count() === y96)
  }

  test("null semantics: every identity the row asserts holds") {
    val r = SparkEntry.queries("q_null_semantics")(spark, dir).head()
    val (rows, nonnull, nullsafe) = (r.getLong(0), r.getLong(1), r.getLong(3))
    assert(rows === nonnull + nullsafe)  // null-safe-null counts the gaps
    assert(r.getLong(5) === rows)        // NULLIF(x, x) is NULL for every row
    assert(r.getLong(2) <= nonnull)
  }
}

class ArrayRoundtripSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("exploded rows reconstruct the source multiset; positions contiguous") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q_array_roundtrip")(spark, dir)
    val src = Tables.lineitem(spark, dir)
      .where(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey").cast("long"),
        round(col("l_quantity") * 100, 0).cast("long"),
        col("l_linenumber").cast("long"))
    // round-trip is lossless: same (okey, qty, ln) multiset
    assert(out.select("okey", "qty_c", "ln").collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.map(_.toString).mkString(","))).toSeq ===
      src.collect().map(_.toSeq).sorted(
        Ordering.by((s: Seq[Any]) => s.map(_.toString).mkString(","))).toSeq)
    // positions are 0..n-1 within each order and qty is non-decreasing
    val bad = out.withColumn("prev", lag("qty_c", 1).over(
      org.apache.spark.sql.expressions.Window.partitionBy("okey").orderBy("pos")))
      .where(col("prev").isNotNull && col("prev") > col("qty_c"))
    assert(bad.count() === 0L)
    assert(out.groupBy("okey").agg(max("pos").as("m"), count(lit(1)).as("n"))
      .where(col("m") =!= col("n") - 1).count() === 0L)
  }
}

class GroupSplitSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("group split: folds conserve mass; no source straddles folds") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("samp_group_split")(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
    assert(out.map(_.getLong(2)).sum === docs.count())
    assert(out.map(_.getLong(1)).sum ===
      docs.select("source").distinct().count()) // each source in ONE fold
    assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 5))
  }
}

class AnisotropySpec extends AnyFunSuite {
  import TestSpark._

  test("anisotropy probe: bounded cosines, deterministic pair count, sane mean") {
    val r1 = SparkEntry.queries("vec_anisotropy")(spark, dir).head()
    val r2 = SparkEntry.queries("vec_anisotropy")(spark, dir).head()
    assert(r1 === r2)                                   // bit-stable rerun
    assert(r1.getLong(0) > 900L && r1.getLong(0) <= 1000L)
    assert(r1.getLong(2) >= -1000000L && r1.getLong(3) <= 1000000L)
    assert(r1.getLong(2) <= r1.getLong(1) && r1.getLong(1) <= r1.getLong(3))
  }
}

class ConcurrencyStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("single-batch streamed sweep equals the batch peak rows exactly") {
    val streamed = streaming.ConcurrencyStream.runToResult(spark, dir)
      .select("day", "peak", "peak_at_us").collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q_events_peak_concurrency")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}

class WindowSuite2Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("suite2 identities: prnk/cdist bounds, nth null until visible, mov3 bounded") {
    val out = SparkEntry.queries("q_window_suite2")(spark, dir)
    assert(out.where(col("prnk") < 0 || col("prnk") > 1 ||
      col("cdist") <= 0 || col("cdist") > 1).count() === 0L)
    // the first row of every partition has prnk 0 and no second_cents yet
    assert(out.where(col("drnk") === 1 && col("prnk") =!= 0.0).count() === 0L)
    // moving sum over <=3 rows is never below the current value alone
    val cur = Tables.orders(spark, dir)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100, 0).cast("long").as("c"))
    assert(out.join(cur, Seq("o_orderkey")).where(col("mov3_cents") < col("c")).count() === 0L)
  }
}

class AssortativitySpec extends AnyFunSuite {
  import TestSpark._

  test("assortativity invariants: symmetric moments, coefficient in [-1, 1]") {
    val r = SparkEntry.queries("q_graph_assortativity")(spark, dir).head()
    // both-orientation construction makes x and y moments IDENTICAL
    assert(r.getLong(2) === r.getLong(3)) // den_x == den_y
    val pml = r.getLong(4)
    assert(pml >= -1000L && pml <= 1000L)
    // Cauchy-Schwarz: |num| <= sqrt(den_x * den_y) = den_x here
    assert(math.abs(r.getLong(1)) <= r.getLong(2))
  }
}

class ActiveTimeStreamSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("streamed per-user unions aggregate to the batch day rows exactly") {
    val streamed = streaming.ActiveTimeStream.runToResult(spark, dir)
      .groupBy("day")
      .agg(sum("active_us").as("total_active_us"),
        count(lit(1)).as("n_users"),
        max("active_us").as("max_user_active_us"))
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q_events_active_time")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}

class Wave21Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("code-switch matrix conserves docs; planted bilingual doc lands off-diagonal") {
    import spark.implicits._
    val tmp = TmpDirs.create("csw")
    val en = "the of and to in is was he for it with as his on be at by had"
    val de = "der die und in den von zu das mit sich des auf ist im dem nicht"
    val df = Seq((0L, s"$en $en", "en", "s", 10), (1L, s"$en $de", "mx", "s", 10))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("text_code_switch")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.values.sum === 2L)
    assert(out.getOrElse(("en", "en"), 0L) === 1L)   // monolingual on-diagonal
    assert(out.getOrElse(("en", "de"), 0L) === 1L)   // bilingual off-diagonal
  }

  test("fano: metronome type is sub-Poisson, burst type super-Poisson") {
    import spark.implicits._
    val tmp = TmpDirs.create("fano")
    // 'tick': one event per minute (variance 0); 'burst': 60 events in
    // one minute + 1 in another (high variance)
    val tick = (0 until 30).map(i => ("tick", i.toLong * 60000000L))
    val burst = (0 until 60).map(_ => ("burst", 0L)) :+ (("burst", 600000000L))
    val ev = (tick ++ burst).zipWithIndex.map { case ((t, us), i) =>
      (i.toLong, 1L, us * 1000L, t)
    }.toDF("event_id", "user_id", "ts_ns", "event_type")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q_events_fano")(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("tick") === 0L)        // zero variance
    assert(out("burst") > 1000L)      // super-Poisson
  }
}

class MarkovStationarySpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("stationary mass is conserved (mod truncation) and a sink state absorbs") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_events_markov_stationary")(spark, dir).collect()
    val mass = rows.map(_.getLong(1)).sum
    // truncation loses at most |types| u6 per step x 8 steps
    assert(mass <= 1000000L && mass > 1000000L - 8L * rows.length * rows.length)
    // planted absorbing chain: a -> b always, b -> b always => all mass on b
    val tmp = TmpDirs.create("mkv")
    val ev = (0 until 40).map { i =>
      (i.toLong, (i / 20).toLong, i.toLong * 1000000000L, if (i % 20 == 0) "a" else "b")
    }.toDF("event_id", "user_id", "ts_ns", "event_type")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val st = SparkEntry.queries("q_events_markov_stationary")(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st("a") === 0L)
    assert(st("b") > 990000L)
  }
}

class PqDistortionSpec extends AnyFunSuite {
  import TestSpark._

  test("distortion: one row per subspace, fitted beats a degenerate codebook") {
    val emb = Tables.embeddings(spark, dir)
    val cb = ann.Pq.fittedCodebook(emb)
    val fitted = ann.Pq.distortion(emb, cb).collect()
    assert(fitted.length === ann.Pq.m)
    fitted.foreach { r =>
      assert(r.getLong(1) === emb.count())
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(3))
    }
    // degenerate codebook: every centroid the zero vector -> distortion
    // becomes the raw subvector energy, strictly worse in every subspace
    val zero = Array.fill(ann.Pq.m, ann.Pq.kCent, ann.Pq.dsub)(0.0)
    val degen = ann.Pq.distortion(emb, zero).collect()
    fitted.zip(degen).foreach { case (f, z) =>
      assert(f.getLong(2) < z.getLong(2),
        s"subspace ${f.getLong(0)}: fitted ${f.getLong(2)} !< zero ${z.getLong(2)}")
    }
  }
}

class OovRateSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("OOV mass conserves; a full-coverage vocab would zero it") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("text_oov_rate")(spark, dir).collect()
    val words = Tables.documents(spark, dir)
      .select(col("source"), explode(text.Text.words(col("text"))).as("w"))
    assert(rows.map(_.getLong(1)).sum === words.count())
    // total OOV equals the occurrence mass of words OUTSIDE the top-1000
    val vocab = words.groupBy("w").agg(count(lit(1)).as("cf"))
      .orderBy(desc("cf"), col("w")).limit(1000).select("w")
    val oov = words.join(vocab, Seq("w"), "left_anti").count()
    assert(rows.map(_.getLong(2)).sum === oov)
    rows.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000))
  }
}

class SourceHhiSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("HHI bounds: uniform floor 1/n, top-share lower bound, effective count") {
    val r = SparkEntry.queries("pipe_source_hhi")(spark, dir).head()
    val (n, top, hhi, eff) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(hhi >= 1000000L / n - n)       // >= 1/n (minus truncation slack)
    assert(hhi <= 1000000L)
    assert(hhi * n >= top * top / 1000000L * 1L || hhi >= top * top / 1000000L)
    assert(eff <= n * 1000000L + n)       // effective sources <= n (u6)
    // planted monopoly: one source holds everything -> HHI ~= 1, eff ~= 1
    import spark.implicits._
    val tmp = TmpDirs.create("hhi")
    Seq((0L, "a b c d e", "en", "solo", 9), (1L, "f g h i j", "en", "solo", 9))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = SparkEntry.queries("pipe_source_hhi")(spark, tmp).head()
    assert(m.getLong(2) === 1000000L && m.getLong(3) === 1000000L)
  }
}

class Chi2Spec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("chi2: nonnegative, and a perfectly independent table scores ~0") {
    val r = SparkEntry.queries("q_brand_type_chi2")(spark, dir).head()
    assert(r.getLong(1) >= 0L)
    assert(r.getLong(0) <= Tables.part(spark, dir)
      .select("p_brand").distinct().count() *
      Tables.part(spark, dir).select("p_type").distinct().count())
    // planted independence: every (brand, type) cell equally filled
    import spark.implicits._
    val tmp = TmpDirs.create("chi2")
    val rows = for { b <- 0 until 3; t <- 0 until 4; i <- 0 until 5 } yield
      ((b * 100 + t * 10 + i).toLong, s"name$i", s"B$b", s"T$t", 1, 1.0)
    rows.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val ind = SparkEntry.queries("q_brand_type_chi2")(spark, tmp).head()
    assert(ind.getLong(1) === 0L)
    assert(ind.getLong(0) === 12L)
  }
}

class AutocorrSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("autocorr in [-1000, 1000]; a perfect sawtooth anti-correlates") {
    val r = SparkEntry.queries("q_events_autocorr")(spark, dir).head()
    assert(math.abs(r.getLong(4)) <= 1000L)
    assert(math.abs(r.getLong(1)) <= // Cauchy-Schwarz
      math.sqrt(r.getLong(2).toDouble * r.getLong(3).toDouble).toLong + 1)
    // planted sawtooth: minute counts alternate 1, 3, 1, 3 -> lag-1
    // correlation is exactly -1 (every pair is (1,3) or (3,1))
    import spark.implicits._
    val tmp = TmpDirs.create("ac")
    val ev = (0 until 40).flatMap { m =>
      val k = if (m % 2 == 0) 1 else 3
      (0 until k).map(j => (m.toLong * 10 + j, 1L, (m.toLong * 60 + j) * 1000000000L))
    }.toDF("event_id", "user_id", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val saw = SparkEntry.queries("q_events_autocorr")(spark, tmp).head()
    assert(saw.getLong(4) === -1000L)
  }
}

class DupSpanRemovalSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("planted shared prefix is cut from both docs; removed mass = span union") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, s"$shared alpha beta gamma delta epsilon"),
      (1L, s"$shared zeta eta theta iota kappa"),
      (2L, "wholly unique text with no repeated span at all ok"),
      (3L, "tiny doc")) // < 8 words: no grams, nothing removable
      .toDF("doc_id", "text")
    val out = text.Spans.removeDuplicated(docs, n = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    // docs 0/1: dup 8-gram starts at 1..3 (inside the 10-word shared
    // prefix) -> union [1,10] -> exactly the 10 shared words removed
    Seq(0L, 1L).foreach { id =>
      val r = out(id)
      assert(r.getLong(1) === 15L) // n_words
      assert(r.getLong(2) === 3L)  // n_dup_starts
      assert(r.getLong(3) === 10L) // n_removed = span union, not 3*8
    }
    assert(out(0L).getString(4) === "alpha beta gamma delta epsilon")
    assert(out(1L).getString(4) === "zeta eta theta iota kappa")
    // untouched docs survive verbatim (canonicalized)
    assert(out(2L).getLong(3) === 0L)
    assert(out(2L).getString(4) === "wholly unique text with no repeated span at all ok")
    assert(out(3L).getLong(3) === 0L && out(3L).getString(4) === "tiny doc")
  }

  test("removed mass equals detected dup positions' interval union on real data") {
    val rem = SparkEntry.queries("text_dup_span_removal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val det = SparkEntry.queries("text_dup_spans")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rem.keySet === det.keySet)
    rem.foreach { case (id, r) =>
      // a doc loses words iff detection saw dup positions, and never
      // more words than n_dup_starts * 8 (each start covers <= 8)
      val dupStarts = r.getLong(2)
      assert((r.getLong(3) > 0L) === (det(id).getLong(2) > 0L))
      assert(dupStarts === det(id).getLong(2))
      assert(r.getLong(3) <= dupStarts * 8L)
      assert(r.getLong(3) >= (if (dupStarts > 0L) 8L else 0L))
    }
  }
}

class RocAucSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("perfect separation gives AUC 1.0; inverted gives 0; exact integers") {
    import spark.implicits._
    val perfect = (1 to 50).map(i => (i.toLong * 1000000L + 10000000L, true)) ++
      (1 to 50).map(i => (i.toLong * 1000000L - 60000000L, false))
    val thr = Seq(-50L, -25L, 0L, 25L, 50L).map(_ * 1000000L)
    val p = text.ModelEval.rocAuc(
      perfect.toDF("score_micro", "label"), "score_micro", "label", thr).head()
    assert(p.getLong(0) === 50L && p.getLong(1) === 50L)
    assert(p.getLong(4) === 1000000L) // AUC = 1.0 exactly
    assert(p.getLong(3) === 2L * 50L * 50L)
    val inverted = perfect.map { case (s, l) => (-s, l) }
    val q = text.ModelEval.rocAuc(
      inverted.toDF("score_micro", "label"), "score_micro", "label", thr).head()
    assert(q.getLong(4) === 0L)
  }

  test("interleaved scores give AUC strictly between 0 and 1") {
    import spark.implicits._
    // positives at even scores, negatives at odd: near-random ordering
    val mixed = (0 until 100).map(i => (i.toLong * 1000000L, i % 2 == 0))
    val thr = (0L until 100L by 10L).map(_ * 1000000L)
    val r = text.ModelEval.rocAuc(
      mixed.toDF("score_micro", "label"), "score_micro", "label", thr).head()
    assert(r.getLong(4) > 300000L && r.getLong(4) < 700000L)
    // trapezoid identity: auc_num2 <= auc_den, both positive
    assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(3))
  }
}

class BfsFallbackSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("khop shuffle fallback produces the broadcast path's exact labels") {
    import spark.implicits._
    // path graph 0-1-2-3-4 plus a branch 1-10, seed 0
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (1L, 10L)).toDF("a", "b")
    val bidir = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    def labels(limit: Long) = {
      val rounds = scala.collection.mutable.ArrayBuffer[Boolean]()
      val v = graph.Bfs.khop(bidir, 0L, 3, limit, (_, _, b) => rounds += b)
      val out = v.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      v.unpersist()
      (out, rounds.toSeq)
    }
    val (viaB, rb) = labels(1000000L)
    val (viaS, rs) = labels(0L) // every round past the seed must shuffle
    assert(rb.forall(identity))
    assert(rs.forall(b => !b))
    assert(viaB === viaS)
    assert(viaB === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 10L -> 2L, 3L -> 3L))
  }
}

class EditVerifySpec extends AnyFunSuite {
  import TestSpark._

  test("candidates carry exact edit distances; verdict tracks the 30 permille gate") {
    val out = SparkEntry.queries("dedup_edit_verify")(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (dist, maxLen, relPml, verified) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(relPml === dist * 1000 / maxLen)
      assert(verified === (relPml <= 30L))
      assert(dist >= 0L && maxLen >= 1L)
    }
    // the corpus's planted near-dups keep the verdict non-degenerate
    assert(out.exists(_.getBoolean(5)) && out.exists(!_.getBoolean(5)))
  }
}

class SplitLeakageSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("planted identical docs leak exactly across their split boundaries") {
    import spark.implicits._
    val tmp = TmpDirs.create("leak")
    val ids = (0L until 40L)
    val txt = "the quick brown fox jumps over the lazy dog and keeps on running far away"
    ids.map(i => (i, txt, "en", "srcA", txt.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // expected: identical docs are all-pairs candidates; leakage = pairs
    // whose splitOf labels differ (computed via the SAME primitive)
    val splits = ids.map(i => i -> spark.range(1).select(
      ops.Sample.splitOf(lit(i))).head.getString(0)).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b && splits(a) != splits(b)
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "planted ids must span splits")
    val got = SparkEntry.queries("samp_split_leakage")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }
}

class CentroidAffinitySpec extends AnyFunSuite {
  import TestSpark._

  test("parallel label centroids score ~1e6; orthogonal ~0") {
    import spark.implicits._
    def unit(dim: Int): Seq[Float] =
      (0 until 64).map(j => if (j == dim) 1.0f else 0.0f)
    val rows =
      (0 until 5).map(i => (i.toLong, unit(0), 0L)) ++
      (5 until 10).map(i => (i.toLong, unit(0), 1L)) ++ // parallel to label 0
      (10 until 15).map(i => (i.toLong, unit(1), 2L))   // orthogonal
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = vec.Centroid.affinity(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(out((0L, 1L)) >= 999999L)
    assert(math.abs(out((0L, 2L))) <= 1000L)
    assert(math.abs(out((1L, 2L))) <= 1000L)
  }

  test("affinity on the gated corpus is bounded and upper-triangular") {
    val out = SparkEntry.queries("vec_centroid_affinity")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(math.abs(r.getLong(4)) <= 1000000L)
      assert(r.getLong(2) > 0L && r.getLong(3) > 0L)
    }
  }
}

class MmTilesSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("real-decode tile sums partition the raster exactly (formula cross-check)") {
    import spark.implicits._
    val docs = Seq(0L, 7L, 13L, 25L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out = mm.Multimodal.tileSums(spark, mm.Multimodal.imageFrame(spark, docs), 2, 2)
      .collect().map(t => (t.doc_id, t.tile_y, t.tile_x) -> (t.width, t.height, t.px_sum)).toMap
    Seq(0L, 7L, 13L, 25L).foreach { id =>
      val (w, h) = (mm.Multimodal.srcWidth(id), mm.Multimodal.srcHeight(id))
      val expect = Array.ofDim[Long](2, 2)
      for (y <- 0 until h; x <- 0 until w)
        expect(y * 2 / h)(x * 2 / w) += mm.Multimodal.pixelValue(id, 0, x, y).toLong
      for (ty <- 0 until 2; tx <- 0 until 2) {
        val (gw, gh, sum) = out((id, ty, tx))
        assert((gw, gh) === (w, h))
        assert(sum === expect(ty)(tx), s"doc $id tile ($ty,$tx)")
      }
      // the four tiles partition the raster: sums add to the whole image
      val total = (0 until 2).flatMap(ty => (0 until 2).map(tx => out((id, ty, tx))._3)).sum
      val whole = (for (y <- 0 until h; x <- 0 until w)
        yield mm.Multimodal.pixelValue(id, 0, x, y).toLong).sum
      assert(total === whole)
    }
  }
}

class PcaProjectSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("projections are the exact integer dots with the fitted basis") {
    val emb = Tables.embeddings(spark, dir)
    val basis = SparkEntry.queries("vec_pca_basis")(spark, dir).collect()
    val v1 = basis.map(r => r.getLong(1))
    val v2 = basis.map(r => r.getLong(2))
    val q8 = emb.select(col("vec_id"), graft.vec.Vec.int8Normalize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val out = SparkEntry.queries("vec_pca_project")(spark, dir).collect()
    assert(out.length === q8.size)
    out.take(20).foreach { r =>
      val q = q8(r.getLong(0))
      assert(r.getLong(1) === q.zip(v1).map { case (a, b) => a * b }.sum)
      assert(r.getLong(2) === q.zip(v2).map { case (a, b) => a * b }.sum)
    }
  }
}

class GraphSearchSpec extends AnyFunSuite {
  import TestSpark._

  test("beam search returns ranked, deduplicated, reachable neighbors") {
    val out = SparkEntry.queries("ann_graph_search")(spark, dir).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 10)
      // rnk sequential from 1; cosine non-increasing in rank order
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to rows.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2))
        case _ =>
      }
      // never returns the query itself; no duplicate neighbors
      assert(!rows.exists(_.getLong(1) == q))
      assert(rows.map(_.getLong(1)).distinct.length === rows.length)
    }
    // the navigator must find at least one true top-10 neighbor somewhere
    val bf = SparkEntry.queries("ann_bruteforce_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).count(bf.contains) > 0)
  }
}

class BootstrapSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("32 Poisson replicates bracket the point estimate with a consistent CI") {
    val out = SparkEntry.queries("samp_bootstrap")(spark, dir).collect()
    assert(out.length === 32)
    assert(out.map(_.getLong(0)).toSeq === (0L to 31L))
    // every replicate resamples ~n rows; weighted mean = truncated division
    out.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getLong(3) === r.getLong(2) * 1000L / r.getLong(1))
    }
    // CI columns constant across the frame, ordered, inside the replicate range
    val lo = out.map(_.getDouble(4)).distinct
    val hi = out.map(_.getDouble(5)).distinct
    assert(lo.length === 1 && hi.length === 1 && lo.head <= hi.head)
    val means = out.map(_.getLong(3))
    assert(lo.head >= means.min.toDouble && hi.head <= means.max.toDouble)
    // the unweighted corpus mean must land inside the replicate spread
    val truth = Tables.orders(spark, dir)
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long") * 1000L)
        .cast("double") / count(lit(1)))
      .head().getDouble(0)
    assert(means.min.toDouble <= truth && truth <= means.max.toDouble)
  }

  test("replicate sizes concentrate near n (Poisson(1) per row)") {
    val n = Tables.orders(spark, dir).count()
    val out = SparkEntry.queries("samp_bootstrap")(spark, dir).collect()
    // 6-sigma band on sum of n Poisson(1) draws
    val band = 6.0 * math.sqrt(n.toDouble)
    out.foreach(r => assert(math.abs(r.getLong(1) - n).toDouble <= band))
  }
}

class LengthBucketsSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("quartile buckets partition each source with monotone length ranges") {
    val out = SparkEntry.queries("pipe_length_buckets")(spark, dir).collect()
    assert(out.nonEmpty)
    val perSource = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      // buckets partition the source corpus
      assert(rows.map(_.getLong(2)).sum === perSource(src))
      // ranges are disjoint and ordered: max of bucket k <= min of bucket k+1
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) <= b.getLong(4))
        case _ =>
      }
      // quartiles of a non-degenerate source fill all four buckets
      if (rows.map(_.getLong(4)).distinct.length > 1)
        assert(rows.length >= 2)
    }
  }
}

class ImportanceSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("importance gate keeps exactly the top half of non-target docs") {
    val out = SparkEntry.queries("samp_importance")(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(out.length === nDocs)
    // target docs are reference-only: scored but never kept — and the
    // target set is non-empty, or this asserts nothing
    assert(out.count(_.getBoolean(1)) > 0)
    assert(out.filter(_.getBoolean(1)).forall(!_.getBoolean(4)))
    val nt = out.filter(r => !r.getBoolean(1))
    val kept = nt.filter(_.getBoolean(4)).map(_.getLong(3))
    val dropped = nt.filter(!_.getBoolean(4)).map(_.getLong(3))
    // the gate is a score threshold: every kept score >= every dropped
    if (kept.nonEmpty && dropped.nonEmpty) assert(kept.min >= dropped.max)
    // median split keeps at least half (ties can push it over)
    assert(kept.length >= nt.length / 2)
  }

  test("a planted target-vocab doc outranks a planted off-vocab doc") {
    val docs = spark.createDataFrame(Seq(
      (1L, "alpha beta alpha beta", "tgt"),
      (2L, "alpha beta gamma alpha", "raw"),
      (3L, "zeta eta theta iota", "raw"),
      (4L, "alpha alpha beta beta", "raw"))).toDF("doc_id", "text", "source")
    val out = graft.text.InfoTheory.importanceWeights(docs, "tgt")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(2L) > out(3L))
    assert(out(4L) > out(3L))
  }
}

class SourceOverlapSpec extends AnyFunSuite {
  import TestSpark._

  test("pair matrix is complete, symmetric-free and Jaccard-consistent") {
    val out = SparkEntry.queries("pipe_source_overlap")(spark, dir).collect()
    val sources = out.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
    // one row per unordered pair of gram-bearing sources
    assert(out.length === sources.length * (sources.length - 1) / 2)
    out.foreach { r =>
      val (na, nb, inter, uni) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getString(0) < r.getString(1))
      assert(inter >= 0L && inter <= math.min(na, nb))
      assert(uni === na + nb - inter)
      assert(r.getLong(6) === inter * 1000L / uni)
    }
  }
}

class GraphRecallSpec extends AnyFunSuite {
  import TestSpark._

  test("entry-layer beam search recalls most of the true top-10") {
    val out = SparkEntry.queries("ann_graph_recall")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) === 10L)
      assert(r.getLong(3) === r.getLong(2) * 1000L / r.getLong(1))
    }
    // the coarse entry layer must make graph-ANN competitive: mean
    // recall well above the single-probe LSH floor (0-100 pml)
    val mean = out.map(_.getLong(3)).sum / out.length
    assert(mean >= 500L, s"mean graph recall $mean pml")
  }
}

class PcaVarSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("energy shares are per-vector-bounded and v1 >= v2 on average") {
    val out = SparkEntry.queries("vec_pca_var")(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === Tables.embeddings(spark, dir).count())
    val (s1, s2) = (r.getLong(1), r.getLong(2))
    assert(s1 >= 0L && s1 <= 1000L && s2 >= 0L && s2 <= 1000L)
    // v1 is the dominant direction; allow integer-truncation slack
    assert(s1 + 1 >= s2)
    // the fitted plane must beat the 2/d isotropic floor
    assert(s1 + s2 > 2000L / 64L)
  }
}

class PackBoundariesSpec extends AnyFunSuite {
  import TestSpark._

  test("boundaries are contiguous within each source stream") {
    val out = SparkEntry.queries("pipe_pack_boundaries")(spark, dir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r.getLong(1), r.getLong(5)))
      // offsets chain: each doc starts where the previous one ended
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) === a.getLong(3) + a.getLong(4))
        case _ =>
      }
      // seq restarts at 1 per pack and increments
      ordered.groupBy(_.getLong(1)).foreach { case (_, pk) =>
        assert(pk.map(_.getLong(5)).sorted.toSeq === (1L to pk.length).toSeq)
      }
    }
  }
}

class SoftDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("singletons always survive; expected cluster mass is one doc") {
    val out = SparkEntry.queries("samp_soft_dedup")(spark, dir).collect()
    assert(out.length === Tables.documents(spark, dir).count())
    // csize=1 => threshold 2^32 > any u32 => kept
    out.filter(_.getLong(2) === 1L).foreach(r => assert(r.getBoolean(4)))
    // kept iff u32 < 2^32 div csize, recomputed independently
    out.foreach { r =>
      val thr = 4294967296L / r.getLong(2)
      assert(r.getBoolean(4) === (r.getLong(3) < thr))
    }
    // cluster sizes are consistent: every member of a cluster reports
    // the cluster's member count
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      assert(rows.forall(_.getLong(2) === rows.length))
    }
  }
}

class KanonSpec extends AnyFunSuite {
  import TestSpark._

  test("cells partition customers and the flag is exactly n < k") {
    val out = SparkEntry.queries("q_kanon_audit")(spark, dir).collect()
    assert(out.map(_.getLong(3)).sum === Tables.customer(spark, dir).count())
    out.foreach(r => assert(r.getBoolean(4) === (r.getLong(3) < 10L)))
    // quasi-id cells are unique
    val keys = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(keys.distinct.length === keys.length)
  }
}

class EwmaSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("levels replay the integer recursion; error matches a hand fold") {
    val dayNs = 86400L * 1000000000L
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(s"ts_ns div $dayNs").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0)).map { case (t, rows) =>
        t -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      }
    val out = SparkEntry.queries("q_events_ewma")(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet === counts.keySet)
    out.foreach { r =>
      val ns = counts(r.getString(0))
      assert(r.getLong(1) === ns.length.toLong)
      val levels = ns.indices.map(i =>
        ns.take(i + 1).reduceLeft((a, c) => (c + 3 * a) / 4))
      assert(r.getLong(2) === levels.last)
      val err = (1 until ns.length).map(i => math.abs(ns(i) - levels(i - 1))).sum
      assert(r.getLong(3) === err)
      val vol = ns.drop(1).sum
      assert(r.getLong(4) === vol)
      assert(r.getLong(5) === (if (vol == 0) 0L else err * 1000L / vol))
    }
  }
}

class LinkPredictSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("predictions are non-edges with consistent Jaccard, ranked") {
    val out = SparkEntry.queries("q_graph_link_predict")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val e = SparkEntry.copurchaseEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val (u, v, cn, du, dv) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(u < v)
      assert(!e.contains((u, v)), s"($u,$v) is an existing edge")
      assert(cn >= 1L && cn <= math.min(du, dv))
      assert(r.getLong(5) === cn * 1000L / (du + dv - cn))
    }
    // ranked non-increasing
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(5) >= b.getLong(5))
      case _ =>
    }
  }
}

class FeatureHashSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("hashed embedding reproduces a hand-computed doc; mass is conserved") {
    val out = SparkEntry.queries("text_feature_hash")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(1) >= 0L && r.getLong(1) < 64L))
    // |sum of vals| per doc <= token count; total |val| mass <= corpus tokens
    val toks = Tables.documents(spark, dir)
      .agg(sum(graft.text.Text.wordCount(col("text")))).head().getLong(0)
    assert(out.map(r => math.abs(r.getLong(2))).sum <= toks)
    // hand-check one synthetic doc through the same public API
    val one = spark.createDataFrame(Seq((7L, "alpha beta alpha")))
      .toDF("doc_id", "text")
    val emb = graft.text.FeatureHash.embed(one).collect()
    val expected = Seq("alpha", "beta", "alpha").groupBy(identity).map {
      case (t, occ) =>
        val h = spark.sql(s"SELECT xxhash64('$t')").head().getLong(0)
        (h & 63L) -> (if ((h & 64L) == 0L) 1L else -1L) * occ.length
    }.groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).sum }
    val got = emb.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === expected.filter(_._2 != 0L) ++ expected.filter(_._2 == 0L))
  }
}

class SignPackSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("packed word replays the sign bits of the quantized vector") {
    val out = SparkEntry.queries("vec_sign_pack")(spark, dir).collect()
    val q = Tables.embeddings(spark, dir)
      .select(col("vec_id"), graft.vec.Vec.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out.length === q.size)
    out.take(25).foreach { r =>
      val v = q(r.getLong(0))
      val expected = v.zipWithIndex.foldLeft(0L) {
        case (acc, (x, i)) => if (x > 0L) acc | (1L << i) else acc
      }
      assert(r.getLong(1) === expected)
      assert(r.getLong(2) === java.lang.Long.bitCount(expected).toLong)
    }
  }
}

class HammingTopkSpec extends AnyFunSuite {
  import TestSpark._

  test("hamming candidates broadly agree with exact cosine truth") {
    val out = SparkEntry.queries("ann_hamming_topk")(spark, dir).collect()
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length === 10)
      assert(!rows.exists(_.getLong(1) == qid))
      val sorted = rows.sortBy(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) <= b.getLong(2))
        case _ =>
      }
      rows.foreach(r => assert(r.getLong(2) >= 0L && r.getLong(2) <= 64L))
    }
    // the 1-bit proxy must still find true neighbors: some overlap
    // with brute-force cosine top-10 across the query set
    val bf = SparkEntry.queries("ann_bruteforce_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).count(bf.contains) > 0)
  }
}

class GapfillSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("grid is complete per type, filled rows carry the previous value") {
    val out = SparkEntry.queries("q_events_gapfill")(spark, dir).collect()
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      val hours = rows.map(_.getLong(1))
      // contiguous h0..h1 grid, no holes
      assert(hours.toSet === (hours.min to hours.max).toSet)
      // boundary rows are observed, never synthesized
      val sorted = rows.sortBy(_.getLong(1))
      assert(!sorted.head.getBoolean(4) && !sorted.last.getBoolean(4))
      // a filled row repeats the last observed val_c_ff and has n = 0
      sorted.sliding(2).foreach {
        case Array(a, b) if b.getBoolean(4) =>
          assert(b.getLong(2) === 0L)
          assert(b.getLong(3) === a.getLong(3))
        case _ =>
      }
    }
    // fill never invents events: per-grid n sums to the corpus count
    val total = Tables.events(spark, dir).count()
    assert(out.map(_.getLong(2)).sum === total)
  }
}

class RateLimitSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("per-user report replays a brute-force 60s sliding window") {
    val out = SparkEntry.queries("q_events_rate_limit")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 1000").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    assert(out.keySet === ev.keySet)
    ev.take(20).foreach { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      val wins = ts.map(t => ts.count(x => x > t - 60000000L && x <= t).toLong)
      val (n, rej, peak) = out(u)
      assert(n === ts.length.toLong)
      assert(rej === wins.count(_ > 5L).toLong)
      assert(peak === wins.max)
    }
  }
}

class TwapSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("time-weighted average replays the brute-force hold-forward sum") {
    val out = SparkEntry.queries("q_events_twap")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("us"),
        expr("cast(round(value * 100, 0) as long)").as("v_c"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(1), r.getLong(3))))
      .groupBy(_._1)
    ev.take(20).foreach { case (u, rows) =>
      val seq = rows.map(_._2).sortBy(t => (t._1, t._2))
      val wsum = seq.sliding(2).collect {
        case Array((us0, _, v0), (us1, _, _)) => v0 * (us1 - us0)
      }.sum
      val span = seq.last._1 - seq.head._1
      val (n, spanGot, wsumGot, twap) = out(u)
      assert(n === seq.length.toLong)
      assert(spanGot === span)
      assert(wsumGot === wsum)
      assert(twap === (if (span == 0L) 0L else wsum / span))
    }
  }
}

class SkylineSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("skyline rows are exactly the non-dominated parts") {
    val out = SparkEntry.queries("q_skyline_parts")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = Tables.part(spark, dir)
      .select(col("p_partkey").cast("long"),
        expr("cast(round(p_retailprice * 100, 0) as long)"),
        col("p_size").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(x: (Long, Long, Long)) = all.exists(o =>
      o._1 != x._1 && o._2 <= x._2 && o._3 <= x._3 && (o._2 < x._2 || o._3 < x._3))
    val expected = all.filterNot(dominated).toSet
    assert(out.toSet === expected)
    assert(out.nonEmpty)
  }
}

class JsonlMalformedSpec extends AnyFunSuite {
  import TestSpark._

  test("PERMISSIVE json read splits clean rows from the corrupt count") {
    val out = SparkEntry.queries("src_jsonl_malformed")(spark, dir).collect()
    val n = Tables.nation(spark, dir).count()
    val planted = Tables.nation(spark, dir)
      .where(org.apache.spark.sql.functions.expr("n_nationkey % 4 = 0")).count()
    val clean = out.filter(_.getString(3) == "clean")
    val corrupt = out.filter(_.getString(3) == "corrupt_count")
    assert(clean.length.toLong === n - planted)
    assert(corrupt.length === 1)
    assert(corrupt.head.getLong(0) === planted)
    // no planted key leaks into the clean set
    assert(clean.forall(_.getLong(0) % 4 != 0))
  }
}

class DecileLiftSpec extends AnyFunSuite {
  import TestSpark._

  test("gains table: 10 bands, shares sum to ~1000 pml, lift decreasing-ish") {
    val out = SparkEntry.queries("q_decile_lift")(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq === (0L to 9L))
    val nCust = Tables.customer(spark, dir).count()
    assert(out.map(_.getLong(1)).sum === nCust)
    val shares = out.map(_.getLong(3))
    assert(shares.sum <= 1000L && shares.sum > 990L) // floor-truncation slack
    // revenue is sorted into bands: band revenue is non-increasing
    val revs = out.map(_.getLong(2))
    revs.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    // top decile lift is the max and >= uniform 1000 pml
    assert(out.head.getLong(4) === out.map(_.getLong(4)).max)
    assert(out.head.getLong(4) >= 1000L)
  }
}

class AudioSilenceSpec extends AnyFunSuite {
  import TestSpark._

  test("silence runs replay the brute-force envelope threshold islands") {
    val out = SparkEntry.queries("mm_audio_silence")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docs.flatMap { d =>
      val n = mm.Audio.sampleCount(d)
      val sums = (0 until (n + 99) / 100).map { w =>
        (w * 100 until math.min(w * 100 + 100, n))
          .map(i => math.abs(mm.Audio.sampleValue(d, i) - 128).toLong).sum
      }
      val silent = sums.zipWithIndex.filter(_._1 < 6400L).map(_._2)
      // islands over silent window indexes
      silent.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s, e, c) :: t, w) if w == e + 1 => (s, w.toLong, c + 1) :: t
        case (acc, w) => (w.toLong, w.toLong, 1L) :: acc
      }.reverse.map { case (s, e, c) => (d, s, e, c) }
    }
    assert(out.toSet === expected.toSet)
    assert(out.nonEmpty)
    // both silent and loud windows exist (threshold is non-degenerate)
    val totalWins = docs.map(d => (mm.Audio.sampleCount(d) + 99) / 100).sum
    assert(out.map(_._4).sum < totalWins)
  }
}

class OrdersGapSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("gap stats replay a brute-force per-customer diff") {
    val out = SparkEntry.queries("q_orders_gap_stats")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val ords = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val multi = ords.filter(_._2.length >= 2)
    assert(out.keySet === multi.keySet)
    multi.take(20).foreach { case (c, rows) =>
      val days = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val gaps = days.sliding(2).collect { case Array(a, b) => b - a }.toSeq.sorted
      val (n, mn, mx, med) = out(c)
      assert(n === gaps.length.toLong)
      assert(mn === gaps.min && mx === gaps.max)
      val h = (gaps.length - 1) * 0.5
      val lo = gaps(h.toInt).toDouble
      val hi = gaps(math.ceil(h).toInt).toDouble
      assert(med === lo + (h - h.toInt) * (hi - lo))
    }
  }
}

class IncrJoinSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("delta-maintained join view equals the full recompute") {
    val out = SparkEntry.queries("q_incr_join")(spark, dir)
    val full = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("ym"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(o_totalprice * 100, 0) as long)")).as("rev_c"))
    assert(out.count() === full.count())
    assert(out.exceptAll(full).count() === 0L)
    // both split sides actually contribute (the delta terms are non-empty)
    val od = Tables.orders(spark, dir).where(col("o_orderkey") % 4 === 0).count()
    val cd = Tables.customer(spark, dir).where(col("c_custkey") % 5 === 0).count()
    assert(od > 0 && cd > 0)
  }
}

class KeywordExtractSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("RAKE top-20: stopword-free phrases, scores replay the deg/freq fold") {
    val stop = graft.text.Text.stopwords.head._2.toSet
    val out = SparkEntry.queries("text_keyword_extract")(spark, dir).collect()
    assert(out.length === 20)
    out.foreach { r =>
      val ws = r.getString(0).split(" ").toSeq
      assert(ws.length.toLong === r.getLong(1))
      assert(!ws.exists(stop)) // no delimiter word inside a phrase
      assert(r.getLong(3) >= 1L)
    }
    // scores are in published (desc, phrase) order
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) > b.getLong(2) ||
          (a.getLong(2) == b.getLong(2) && a.getString(0) < b.getString(0)))
      case _ =>
    }
    // brute-force the full RAKE fold on the corpus and check the top row
    val docs = Tables.documents(spark, dir).select("text").collect().map(_.getString(0))
    val phrases = docs.flatMap { t =>
      val w = t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      val words = if (w.isEmpty) Array.empty[String] else w.split(" ")
      val runs = scala.collection.mutable.ListBuffer.empty[List[String]]
      var cur = List.empty[String]
      words.foreach { x =>
        if (stop(x)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur = x :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs
    }
    val freq = phrases.flatten.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val deg = phrases.flatMap(p => p.map(_ -> p.length.toLong))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val wscore = freq.keys.map(k => k -> deg(k) * 1000L / freq(k)).toMap
    val scored = phrases.map(p => (p.mkString(" "), p.map(wscore).sum))
      .groupBy(_._1).map { case (k, v) => (k, v.head._2, v.length.toLong) }
    val best = scored.toSeq.sortBy { case (ph, sc, _) => (-sc, ph) }.take(20)
    assert(out.map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq ===
      best.map { case (ph, sc, n) => (ph, sc, n) })
  }
}

class RateLimitStreamSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("ring fold: burst rejects from the 6th event, recovers after the window") {
    var st = streaming.RateLimitStream.RlState(Nil)
    // 8 events in the same second: 1..5 accepted, 6..8 rejected
    (0 until 8).foreach { i =>
      val (next, (nCap, rej)) = streaming.RateLimitStream.step(st, 1000L * i)
      st = next
      assert(rej === (i >= 5), s"event $i")
      assert(nCap === math.min(i, 5).toLong + 1L)
    }
    assert(st.ring.length === 5) // bounded at Limit no matter the burst
    // 61s later the window is clear
    val (_, (nCap2, rej2)) = streaming.RateLimitStream.step(st, 61000000L + 7000L)
    assert(!rej2 && nCap2 === 1L)
  }

  test("streamed decisions replay the prefix-contract brute force") {
    val streamed = streaming.RateLimitStream.runToResult(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.size === ev.length)
    ev.groupBy(_._1).take(25).foreach { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.zipWithIndex.foreach { case ((_, id, us), i) =>
        val priorInWin = ordered.take(i).count(_._3 > us - 60000000L)
        val (nCap, rej) = streamed((u, id))
        assert(rej === (priorInWin >= 5))
        assert(nCap === math.min(priorInWin, 5).toLong + 1L)
      }
    }
  }
}

class ImageEntropySpec extends AnyFunSuite {
  import TestSpark._

  test("pixel entropy replays the quantized-log fold from the formula") {
    def qln(c: Long): Long = math.floor(math.log(c.toDouble) * 1e9).toLong
    val out = SparkEntry.queries("mm_image_entropy")(spark, dir).collect()
    val docs = Tables.documents(spark, dir).select("doc_id").collect().map(_.getLong(0))
    assert(out.length === docs.length)
    out.take(25).foreach { r =>
      val d = r.getLong(0)
      val (w, h) = (mm.Multimodal.srcWidth(d), mm.Multimodal.srcHeight(d))
      assert(r.getInt(1) === w && r.getInt(2) === h)
      val hist = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w)
        hist(mm.Multimodal.pixelValue(d, 0, x, y) / 16) += 1
      val n = w.toLong * h
      val ent = n * qln(n) - hist.filter(_ > 0).map(c => c * qln(c)).sum
      assert(r.getLong(3) === hist.count(_ > 0).toLong)
      assert(r.getLong(4) === ent)
      assert(r.getLong(5) === ent / n)
      assert(ent >= 0L)
    }
  }
}

class KcoreSpec extends AnyFunSuite {
  import TestSpark._

  test("3 peeling rounds reach the true 3-core fixpoint on this corpus") {
    val out = SparkEntry.queries("q_graph_kcore")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force peel to convergence on the collected nation-trade graph
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        org.apache.spark.sql.functions.col("l_suppkey") ===
          org.apache.spark.sql.functions.col("s_suppkey"))
      .selectExpr("cast(c_nationkey as long)", "cast(s_nationkey as long)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = li.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (k, v) => k -> v.length }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      edges = next
    }
    val expect = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(out === expect)
    out.values.foreach(d => assert(d >= 3L))
  }
}

class SnapshotLogSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("older manifests stay blind to later commits; data dirs immutable") {
    val t = graft.TmpDirs.create("snapspec") + "/t"
    sinks.SnapshotLog.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t, 1)
    sinks.SnapshotLog.commit(Seq((3L, "c")).toDF("k", "v"), t, 2)
    assert(sinks.SnapshotLog.readAsOf(spark, t, 1).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
    assert(sinks.SnapshotLog.readAsOf(spark, t, 2).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L))
    // a version's data dir is immutable: re-committing v2 must refuse
    intercept[Exception] {
      sinks.SnapshotLog.commit(Seq((9L, "x")).toDF("k", "v"), t, 2)
    }
    // and the failed retry did not disturb either snapshot
    assert(sinks.SnapshotLog.readAsOf(spark, t, 2).count() === 3L)
  }
}

class TypeAffinitySpec extends AnyFunSuite {
  import TestSpark._

  test("pair jaccard replays the exact user-set overlap") {
    val out = SparkEntry.queries("q_events_type_affinity")(spark, dir).collect()
    val tu = Tables.events(spark, dir).select("event_type", "user_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = tu.groupBy(_._1).map { case (t, v) => t -> v.map(_._2).toSet }
    val types = sets.keys.toSeq.sorted
    val expect = for {
      a <- types; b <- types if a < b
      inter = (sets(a) & sets(b)).size.toLong if inter > 0
    } yield (a, b, sets(a).size.toLong, sets(b).size.toLong, inter,
      inter * 1000L / (sets(a).size + sets(b).size - inter))
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq === expect.toSeq)
  }
}

class JoinSizeEstimateSpec extends AnyFunSuite {
  import TestSpark._

  test("histogram-product prediction equals the materialized join size") {
    val out = SparkEntry.queries("q_join_size_estimate")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(2)) // predicted == actual, the identity
      assert(r.getLong(3) >= 1L && r.getLong(3) <= r.getLong(1))
    }
  }
}

class DedupThresholdSweepSpec extends AnyFunSuite {
  import TestSpark._

  test("sweep is monotone and replays the 500-pml pair kernel") {
    val out = SparkEntry.queries("pipe_dedup_threshold_sweep")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(500L, 600L, 700L, 800L, 900L))
    // tightening the threshold never ADDS pairs or docs
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._2 >= b._2 && a._3 >= b._3)
      case _ =>
    }
    // 500-pml row = the proven dedup_ngram_jaccard kernel (j >= 0.5)
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).collect()
    assert(out.head._2 === pairs.length.toLong)
    val docs = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.length
    assert(out.head._3 === docs.toLong)
  }
}

class KeyframeSpec extends AnyFunSuite {
  import TestSpark._

  test("every segment elects its brightest-earliest frame; frames partition") {
    val out = SparkEntry.queries("mm_video_keyframe")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val byDoc = out.groupBy(_._1)
    val docs = Tables.documents(spark, dir).select("doc_id").collect().map(_.getLong(0))
    assert(byDoc.keySet === docs.toSet)
    byDoc.foreach { case (d, segs) =>
      // segments are 0..n_segs-1 and their sizes sum to the frame count
      assert(segs.map(_._2).sorted.toSeq === (0L until segs.length.toLong))
      assert(segs.map(_._5).sum === mm.Multimodal.frameCount(d).toLong)
    }
    // replay one doc's election from the pixel formula
    val d = docs.min
    val means = (0 until mm.Multimodal.frameCount(d)).map { s =>
      val (w, h) = (6 + ((d + s) % 6).toInt, 6 + ((d + 2 * s) % 6).toInt)
      val sum = (for (y <- 0 until h; x <- 0 until w)
        yield mm.Multimodal.pixelValue(d, s, x, y).toLong).sum
      sum * 1000L / (w.toLong * h)
    }
    val segOf = means.indices.scanLeft(0L) { (acc, i) =>
      if (i == 0) acc
      else acc + (if (math.abs(means(i) - means(i - 1)) > 8000L) 1L else 0L)
    }.tail
    val expect = means.indices.groupBy(segOf(_)).toSeq.sortBy(_._1).map {
      case (sg, idxs) =>
        val best = idxs.maxBy(j => (means(j), -j))
        (d, sg, best, means(best), idxs.length.toLong)
    }
    assert(byDoc(d).sortBy(_._2).toSeq === expect)
  }
}

class MatryoshkaSpec extends AnyFunSuite {
  import TestSpark._

  test("dimension-budget curve: 64d is the identity, recall grows with dims") {
    val out = SparkEntry.queries("vec_matryoshka_recall")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).distinct.sorted.toSeq === Seq(16L, 32L, 64L))
    out.foreach { case (_, _, nTruth, nHits, pml) =>
      assert(nTruth === 10L)
      assert(nHits >= 0L && nHits <= 10L)
      assert(pml === nHits * 100L)
    }
    // full-width legs reproduce the truth exactly
    out.filter(_._1 == 64L).foreach { case (_, _, _, nHits, _) => assert(nHits === 10L) }
    // mean recall is non-decreasing in dims (per-query it may wobble)
    val mean = out.groupBy(_._1).view.mapValues(v => v.map(_._4).sum).toMap
    assert(mean(16L) <= mean(32L) && mean(32L) <= mean(64L))
  }
}

class TimeSplitSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("walk-forward folds: contiguous spans, no future leakage, populations add up") {
    val out = SparkEntry.queries("samp_time_split")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    // spans tile the day range with no gap or overlap
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._3 === b._2)
      case _ =>
    }
    val days = Tables.events(spark, dir)
      .select(expr("ts_ns div 1000 div 86400000000").as("day")).collect()
      .map(_.getLong(0))
    out.foreach { case (_, from, until, nTrain, nTest) =>
      assert(nTrain === days.count(_ < from).toLong)
      assert(nTest === days.count(d => d >= from && d < until).toLong)
    }
    // fold 4's train+test covers every event except its own test span future... = all
    assert(out.last._4 + out.last._5 === days.length.toLong)
  }
}

class UserGrowthSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("growth curve replays first-seen arithmetic; cum ends at distinct users") {
    val out = SparkEntry.queries("q_events_user_growth")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 1000 div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstSeen = ev.groupBy(_._1).map { case (_, v) => v.map(_._2).min }
    out.foreach { case (day, dau, newU, _) =>
      assert(dau === ev.filter(_._2 == day).map(_._1).distinct.length.toLong)
      assert(newU === firstSeen.count(_ == day).toLong)
    }
    assert(out.map(_._3).sum === ev.map(_._1).distinct.length.toLong)
    assert(out.last._4 === ev.map(_._1).distinct.length.toLong)
    // cumulative is the prefix sum of new users
    assert(out.map(_._3).scanLeft(0L)(_ + _).tail.toSeq === out.map(_._4).toSeq)
  }
}

class AudioPeriodicitySpec extends AnyFunSuite {
  import TestSpark._

  test("autocorrelation argmax replays the envelope fold from the formula") {
    val out = SparkEntry.queries("mm_audio_periodicity")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, dir).select("doc_id").collect().map(_.getLong(0))
    assert(out.length === docs.length)
    out.take(25).foreach { case (d, nWins, bestLag, bestScore) =>
      val n = mm.Audio.sampleCount(d)
      val e = (0 until (n + 99) / 100).map { w =>
        (w * 100 until math.min(w * 100 + 100, n))
          .map(i => math.abs(mm.Audio.sampleValue(d, i) - 128).toLong).sum
      }
      assert(nWins === e.length.toLong)
      val scores = (1 to 4).map { lag =>
        if (e.length <= lag) 0L
        else (lag until e.length).map(i => e(i) * e(i - lag)).sum / (e.length - lag)
      }
      assert(bestScore === scores.max)
      assert(bestLag === scores.indexOf(scores.max).toLong + 1L)
    }
    assert(out.map(_._3).distinct.length > 1) // the probe discriminates
  }
}

class StreaksSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("longest streak replays the brute-force islands per user") {
    val out = SparkEntry.queries("q_events_streaks")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 1000 div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    assert(out.keySet === ud.keySet)
    ud.take(30).foreach { case (u, rows) =>
      val days = rows.map(_._2).sorted
      var lens = List.empty[Long]
      var cur = 1L
      days.sliding(2).foreach {
        case Array(a, b) => if (b == a + 1) cur += 1 else { lens ::= cur; cur = 1 }
        case _ =>
      }
      lens ::= cur
      val (nRuns, longest, active) = out(u)
      assert(nRuns === lens.length.toLong)
      assert(longest === lens.max)
      assert(active === days.length.toLong)
    }
  }
}

class ProvenanceSpec extends AnyFunSuite {
  import TestSpark._

  test("uid chain replays SplitMix64 and is collision-free per stage") {
    val out = SparkEntry.queries("pipe_row_provenance")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def mix(x: Long): Long = graft.functions.Mix64(x)
    out.take(50).foreach { case (d, u1, u2, u3) =>
      assert(u1 === mix(d ^ 1001L))
      assert(u2 === mix(u1 ^ 2007L))
      assert(u3 === mix(u2 ^ 3005L))
    }
    // deterministic re-run: identical ids
    val again = SparkEntry.queries("pipe_row_provenance")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === again.toSeq)
    // no collisions at any stage on this corpus
    assert(out.map(_._2).distinct.length === out.length)
    assert(out.map(_._4).distinct.length === out.length)
  }
}

class PositionAttributionSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("U-shaped credits follow the 40/20/40 integer rules on a planted journey") {
    import spark.implicits._
    // one user: 4 touches then a 1000-cent purchase inside the window,
    // plus a touch OUTSIDE the lookback that must get nothing
    val ns = 1000000000L
    val ev = Seq(
      (1L, 0L * ns, "click", 0.0),          // outside (lookback 100s)
      (1L, 500L * ns, "view", 0.0),         // first
      (1L, 510L * ns, "click", 0.0),        // middle
      (1L, 520L * ns, "view", 0.0),         // middle
      (1L, 530L * ns, "click", 0.0),        // last
      (1L, 550L * ns, "purchase", 10.0))    // 1000 cents
      .toDF("user_id", "ts_ns", "event_type", "value")
      .withColumn("event_id", col("ts_ns"))
    val out = ops.Attribution.positional(
      ev, Seq("click", "view"), "purchase", lookbackNs = 100L * ns,
      valueCents = (col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(1), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    // 40% = 400 to first and last, 20% = 200 splits 100/100 across middles
    assert(out === Array(
      (500L * ns, "first", 400L), (510L * ns, "middle", 100L),
      (520L * ns, "middle", 100L), (530L * ns, "last", 400L)))
  }

  test("n=1 and n=2 degenerate rules conserve the full value") {
    import spark.implicits._
    val ns = 1000000000L
    val ev = Seq(
      (1L, 10L * ns, "click", 0.0), (1L, 20L * ns, "purchase", 0.07), // 7 cents, n=1
      (2L, 10L * ns, "view", 0.0), (2L, 15L * ns, "click", 0.0),
      (2L, 20L * ns, "purchase", 0.07)) // n=2: 3 + 4
      .toDF("user_id", "ts_ns", "event_type", "value")
      .withColumn("event_id", col("ts_ns"))
    val out = ops.Attribution.positional(
      ev, Seq("click", "view"), "purchase", lookbackNs = 100L * ns,
      valueCents = (col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4))).toSet
    assert(out === Set((1L, "first", 7L), (2L, "first", 3L), (2L, "last", 4L)))
  }
}

class SourceKlSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("per-source KL replays the quantized-log fold and is never materially negative") {
    val out = SparkEntry.queries("text_source_kl")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // brute-force from raw token counts
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(text.Text.words(col("text"))).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySrcWord = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySrc = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byWord = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nC = toks.length.toLong
    def qln(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    assert(out.keySet === bySrc.keySet)
    out.foreach { case (src, (nTokens, nTypes, klNano)) =>
      assert(nTokens === bySrc(src))
      val types = bySrcWord.keys.filter(_._1 == src).toSeq
      assert(nTypes === types.length.toLong)
      val sum = types.map { k =>
        val cSw = bySrcWord(k)
        cSw * (qln(cSw) + qln(nC) - qln(bySrc(src)) - qln(byWord(k._2)))
      }.sum
      assert(klNano === sum / bySrc(src))
      // KL >= 0 up to nano-quantization dust
      assert(klNano >= -10L)
    }
  }
}

class VocabCoverageSpec extends AnyFunSuite {
  import TestSpark._

  test("coverage curve is monotone in k and saturates at full vocab") {
    val rows = SparkEntry.queries("text_vocab_coverage")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(10L, 20L, 50L, 100L, 200L, 500L))
    val cov = rows.map(_._4)
    assert(cov.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    // ks at/past the vocab size clamp to full coverage
    rows.filter(r => r._1 >= r._2).foreach(r => assert(r._4 === 1000L))
    assert(cov.forall(c => c >= 0L && c <= 1000L))
  }
}

class ChurnRiskSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("silence-to-cadence ratio replays the lower-median brute force") {
    val out = SparkEntry.queries("q_churn_risk")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val corpusMax = o.map(_._3).max
    val byCust = o.groupBy(_._1)
    val repeat = byCust.filter(_._2.length >= 2)
    assert(out.keySet === repeat.keySet)
    repeat.take(30).foreach { case (c, rows) =>
      val days = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val gaps = days.sliding(2).map { case Array(a, b) => b - a }.toSeq.sorted
      val med = gaps((gaps.length + 1) / 2 - 1)
      val (nOrders, lastDay, medGap, silence, risk) = out(c)
      assert(nOrders === rows.length.toLong)
      assert(lastDay === days.max)
      assert(medGap === med)
      assert(silence === corpusMax - days.max)
      assert(risk === silence * 1000 / math.max(med, 1L))
    }
  }
}

class DecayAttributionSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("halving weights split a planted conversion exactly") {
    import spark.implicits._
    val day = 86400000000000L
    // touches at ages 0, 1, and 3 halflives before a 700-cent purchase:
    // weights 1000, 500, 125 -> sw 1625 -> credits 430, 215, 53
    val ev = Seq(
      (1L, 10L * day, "click", 0.0),
      (1L, 12L * day, "view", 0.0),
      (1L, 13L * day, "click", 0.0),
      (1L, 13L * day, "purchase", 7.0))
      .toDF("user_id", "ts_ns", "event_type", "value")
      .withColumn("event_id", col("ts_ns") + when(col("event_type") === "purchase", 1L).otherwise(0L))
    val out = ops.Attribution.timeDecay(
      ev, Seq("click", "view"), "purchase",
      lookbackNs = 7L * day, halflifeNs = day,
      valueCents = (col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(1) / day, r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(out === Array((10L, 3L, 53L), (12L, 1L, 215L), (13L, 0L, 430L)))
    // dust (700 - 698 = 2 cents) stays unattributed by the house rule
    assert(out.map(_._3).sum === 698L)
  }

  test("weight floor keeps every in-window touch credited") {
    import spark.implicits._
    val day = 86400000000000L
    val ev = Seq(
      (1L, 0L, "click", 0.0),            // age 30 halflives -> k capped 9, w floor 1
      (1L, 30L * day, "purchase", 10.0))
      .toDF("user_id", "ts_ns", "event_type", "value")
      .withColumn("event_id", col("ts_ns"))
    val out = ops.Attribution.timeDecay(
      ev, Seq("click", "view"), "purchase",
      lookbackNs = 40L * day, halflifeNs = day,
      valueCents = (col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(out === Array((9L, 1000L))) // lone touch takes all (w/sw = 1)
  }
}

class GrowthStreamSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("streaming first-seen growth equals the batch new-user curve") {
    val streamed = streaming.GrowthStream.newUsersFromStream(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = SparkEntry.queries("q_events_user_growth")(spark, dir)
      .where(col("new_users") > 0)
      .select(col("day"), col("new_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed === batch)
  }
}

class IvfDeltaSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("delta absorption conserves both splits and bounds growth") {
    val rows = SparkEntry.queries("ann_ivf_delta")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val emb = Tables.embeddings(spark, dir)
    val nBase = emb.where(col("vec_id") % 10 =!= 0).count()
    val nDelta = emb.where(col("vec_id") % 10 === 0).count()
    // every vector of each split lands in exactly one cell
    assert(rows.map(_._2).sum === nBase)
    assert(rows.map(_._3).sum === nDelta)
    // cells are the fitted id range and the report replays the ratio
    assert(rows.forall(r => r._1 >= 0 && r._1 < 16))
    rows.foreach(r => assert(r._4 === r._3 * 1000 / math.max(r._2, 1L)))
  }
}

class HeldoutSurprisalSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("held-out surprisal conserves token mass and prices OOV at the ceiling") {
    val rows = SparkEntry.queries("text_heldout_surprisal")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, dir)
    def bucket = shiftrightunsigned(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.Mix64Long(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("doc_id")))),
      32) % lit(100L)
    val heldTokens = docs.where(bucket < 20L)
      .select(explode(text.Text.words(col("text"))))
      .count()
    assert(rows.map(_._2).sum === heldTokens)
    rows.foreach { case (_, n, oov, sur) =>
      assert(oov >= 0 && oov <= n)
      assert(sur > 0) // add-1 smoothed probabilities are < 1 on any real corpus
    }
    // the per-token ceiling is qln(N+V): avg can never exceed it
    val trainToks = docs.where(bucket >= 20L)
      .select(explode(text.Text.words(col("text"))).as("w"))
    val n = trainToks.count()
    val v = trainToks.distinct().count()
    val ceil = math.floor(math.log((n + v).toDouble) * 1e9).toLong
    rows.foreach { case (_, _, _, sur) => assert(sur <= ceil) }
  }
}

class RagRetrievalSpec extends AnyFunSuite {
  import TestSpark._

  test("rag retrieval returns 5 ranked non-self chunks per query with sane cosines") {
    val rows = SparkEntry.queries("pipe_rag_retrieval")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet === Set(0L, 7L, 13L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._5).sorted.toSeq === (1L to 5L))
      assert(rs.forall(_._2 != q)) // never retrieves its own chunks
      assert(rs.forall(r => r._4 >= -1.0001 && r._4 <= 1.0001))
      // ranks follow cosine descending
      val sorted = rs.sortBy(_._5).map(_._4)
      assert(sorted.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }
}

class UserErasureSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("erasure removes exactly the victim users and conserves everyone else") {
    val rows = SparkEntry.queries("snk_user_erasure")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
    val expected = ev.where(col("user_id") % 97 =!= 0)
      .groupBy("day").agg(count(lit(1)).as("n"), countDistinct("user_id").as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.sortBy(_._1).toSeq === expected.toSeq)
    // and the victims existed in the first place (the test isn't vacuous)
    assert(ev.where(col("user_id") % 97 === 0).count() > 0)
  }
}

class LinkageSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  private def custRow(key: Long, nat: Int, bal: Double, seg: String,
      nameNum: Long): (Long, String, Int, Double, String) =
    (key, f"Customer#$nameNum%09d", nat, bal, seg)

  test("record linkage: cross-bucket true match found; score tie resolves to min clean id") {
    import spark.implicits._
    val tmp = TmpDirs.create("link")
    // key 3 perturbs by (3 div 10)%5-2 = -2 cents: 10000 -> 9998, which
    // crosses the whole-dollar bucket edge — found only via the ±1 probe.
    // Decoy key 1 shares nat/seg/last3 and sits 1 cent from the dirty
    // value -> also scores 47; the tie must resolve to the SMALLER clean
    // id (1), making the planted link incorrect on purpose.
    // Key 13 (delta -1) has only its true original -> correct match.
    val rows = Seq(
      custRow(3L, 1, 100.00, "BUILDING", 3L),
      custRow(1L, 1, 99.99, "BUILDING", 1003L), // decoy: last3 = "003"
      custRow(13L, 2, 500.00, "AUTOMOBILE", 13L),
      custRow(7L, 3, 42.42, "MACHINERY", 7L)) // clean-only bystander
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val res = SparkEntry.queries("q_record_linkage")(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(res.keySet === Set(3L, 13L))
    assert(res(3L) === ((1L, 47L, "match")))  // tie at 47 -> min clean id wins
    assert(res(13L) === ((13L, 47L, "match")))
    val ev = SparkEntry.queries("q_linkage_eval")(spark, tmp).collect().head
    assert((ev.getLong(0), ev.getLong(1), ev.getLong(3)) === ((2L, 2L, 1L)))
    assert((ev.getLong(4), ev.getLong(5)) === ((500L, 500L))) // precision/recall pml
  }

  test("resolve emits possible and unmatched verdicts; best pick is windowless") {
    import spark.implicits._
    val scored = Seq(
      (10L, 100L, 35L), // only a mid-evidence candidate -> possible
      (10L, 101L, 20L), // below possibleMin: never considered
      (20L, 200L, 47L), (20L, 201L, 47L)) // tie -> min clean id
      .toDF("dirty_id", "clean_id", "s")
    val all = Seq(10L, 20L, 30L).toDF("dirty_id") // 30 has no candidates
    val out = ops.Linkage.resolve(scored, all, "dirty_id", "clean_id",
        col("s"), matchMin = 42L, possibleMin = 30L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2), r.getString(3)))).toMap
    assert(out(10L) === ((Some(100L), 35L, "possible")))
    assert(out(20L) === ((Some(200L), 47L, "match")))
    assert(out(30L) === ((None, 0L, "unmatched")))
    // no Window in the resolution plan (hot dirty keys partial-aggregate)
    val plan = ops.Linkage.resolve(scored, all, "dirty_id", "clean_id",
      col("s"), 42L, 30L).queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowexpressions"), s"resolution uses a Window:\n$plan")
  }

  test("bucket candidates probe exactly the ±1 neighborhood") {
    import spark.implicits._
    val dirty = Seq((1L, 5L, 10L)).toDF("dirty_id", "blk", "bucket")
    val clean = Seq((100L, 5L, 9L), (101L, 5L, 10L), (102L, 5L, 11L),
      (103L, 5L, 12L), (104L, 6L, 10L)).toDF("clean_id", "blk", "bucket")
    val got = ops.Linkage.bucketCandidates(dirty, clean, "blk", "bucket")
      .select("clean_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(100L, 101L, 102L)) // not 103 (bucket+2), not 104 (other block)
  }
}

class WaterfillSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("waterfill: small strata keep all, large levelled; budget respected") {
    import spark.implicits._
    // avails [10, 20, 100], B = 130 div 2 = 65: sources a,b fully taken
    // (10·3=30 ≤ 65; 20·2+10=50 ≤ 65), c fails (100+30 > 65) ->
    // k=2, cap = (65-30) div 1 = 35, allocs [10, 20, 35]
    val avail = Seq(("a", 10L), ("b", 20L), ("c", 100L)).toDF("source", "avail")
    val out = ops.Sample.waterfillBudget(avail, "source", "avail", 1L, 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(out("a") === ((10L, 10L, false, 35L)))
    assert(out("b") === ((20L, 20L, false, 35L)))
    assert(out("c") === ((100L, 35L, true, 35L)))
    assert(out.values.map(_._2).sum <= 65L)
  }

  test("waterfill: nothing fully taken (tight budget) and everything-fits cases") {
    import spark.implicits._
    // [10, 10], B = 10: no source passes (10·2 > 10) -> k=0, cap = 5
    val tight = ops.Sample.waterfillBudget(
        Seq(("a", 10L), ("b", 10L)).toDF("source", "avail"), "source", "avail", 1L, 2L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tight === Map("a" -> 5L, "b" -> 5L))
    // budget = total (numer=denom): everything fits, cap_level sentinel -1
    val fits = ops.Sample.waterfillBudget(
        Seq(("a", 7L), ("b", 3L)).toDF("source", "avail"), "source", "avail", 1L, 1L)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(fits("a") === ((7L, false, -1L)))
    assert(fits("b") === ((3L, false, -1L)))
  }
}

class CdcChunksSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("source", lit("s"))
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("cdc: chunks reassemble the canon text and word counts reconcile") {
    val base = (1 to 120).map(i => s"w${i % 37}x$i").mkString(" ")
    val ch = text.Chunking.cdcChunks(docs(Seq((1L, base))), maskBits = 3)
    val rows = ch.orderBy("chunk_id").collect()
    assert(rows.map(_.getAs[Long]("n_words")).sum === 120L)
    val glued = rows.map(_.getAs[String]("chunk")).mkString(" ")
    assert(glued === base.toLowerCase)
  }

  test("cdc: a single mid-document edit preserves every distant chunk id") {
    val words = (1 to 200).map(i => s"t${i}q${i % 53}")
    val a = words.mkString(" ")
    val b = words.updated(100, "zzedited").mkString(" ")
    val ch = text.Chunking.cdcChunks(docs(Seq((1L, a), (2L, b))), maskBits = 3)
      .select(col("doc_id"), col("h")).collect()
    val ha = ch.filter(_.getLong(0) == 1L).map(_.getString(1)).toSet
    val hb = ch.filter(_.getLong(0) == 2L).map(_.getString(1)).toSet
    // content-defined boundaries: only the chunk(s) touching the edit
    // differ; with fixed windows an aligned edit would still pass, but
    // CDC also survives INSERTIONS, pinned below
    assert((ha -- hb).size <= 2 && (hb -- ha).size <= 2)
    assert((ha & hb).size >= ha.size - 2)
    // insertion shift: doc 3 = doc 1 with one word PREPENDED — fixed
    // 2^3-word windows would shift every chunk; CDC re-synchronizes
    val c = ("prefixword" +: words).mkString(" ")
    val ch3 = text.Chunking.cdcChunks(docs(Seq((1L, a), (3L, c))), maskBits = 3)
      .select(col("doc_id"), col("h")).collect()
    val h1 = ch3.filter(_.getLong(0) == 1L).map(_.getString(1)).toSet
    val h3 = ch3.filter(_.getLong(0) == 3L).map(_.getString(1)).toSet
    assert((h1 & h3).size >= h1.size - 2)
  }
}

class BpeEncodeSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("fitMerges learns the hand-computed merges and stops when dry") {
    import spark.implicits._
    // word types: 'aa' (freq 6), 'ab' (freq 3) -> merge 1 = (a,a) w=6,
    // merge 2 = (a,b) w=3, then no adjacent pair remains anywhere
    val docs = Seq.fill(3)((1L, "aa ab aa")).zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (merges, dict) = text.Bpe.fitMerges(docs, steps = 3)
    assert(merges === List((1, "a", "a", 6L), (2, "a", "b", 3L)))
    val toks = dict.select(col("w"), expr(text.Bpe.toksExpr).as("t")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(toks("aa") === Seq("aa") && toks("ab") === Seq("ab"))
    dict.unpersist()
  }

  test("encode: token counts follow the learned merges") {
    import spark.implicits._
    val tmp = TmpDirs.create("bpe")
    // 'the' dominates -> merge 1 = (t,h) 8, merge 2 = (th,e) 8; 'cat'
    // pairs (c,a) 4 and (a,t) 4 -> merge 3 = (a,t) by tie-break? no:
    // (a,t)=4 vs (c,a)=4, tie-break a<c picks (a,t)
    val docs = Seq((1L, "the cat the cat the the"), (2L, "the cat the cat the the"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("text_bpe_encode")(spark, tmp).collect()
    // after merges th, the, at: 'the' = 1 token, 'cat' = c|at = 2 tokens
    // doc: 4x the + 2x cat = 6 words, 4 + 2*2 = 8 tokens
    out.foreach { r =>
      assert(r.getAs[Long]("n_words") === 6L)
      assert(r.getAs[Long]("n_bpe_tokens") === 8L)
      assert(r.getAs[Long]("fertility_pml") === 1333L)
    }
  }
}

class NegativesSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("negatives never collide with purchases; at most 4 per customer, ranked 1..k") {
    val neg = SparkEntry.queries("samp_negatives")(spark, dir)
    val purchased = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey").cast("long").as("neg_partkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("custkey"), col("neg_partkey"))
      .distinct()
    assert(neg.join(purchased, Seq("custkey", "neg_partkey")).count() === 0L)
    val perCust = neg.groupBy("custkey")
      .agg(count(lit(1)).as("k"), min("rnk").as("lo"), max("rnk").as("hi")).collect()
    assert(perCust.forall(r => r.getAs[Long]("k") <= 4L))
    assert(perCust.forall(r =>
      r.getAs[Long]("lo") === 1L && r.getAs[Long]("hi") === r.getAs[Long]("k")))
    // deterministic: a re-run lands on identical negatives
    val again = SparkEntry.queries("samp_negatives")(spark, dir)
    assert(neg.exceptAll(again).isEmpty && again.exceptAll(neg).isEmpty)
  }
}

class MmrRerankSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("mmr: an exact duplicate of the top hit is displaced by a diverse hit") {
    import spark.implicits._
    val tmp = TmpDirs.create("mmr")
    // query 0 = (1, 0, 0); id 10 = top hit a; id 11 = EXACT duplicate
    // of a (sim 1e6 -> score 7*rel - 3e6); id 12 = diverse c with
    // rel ~0.60, sim(a, c) ~0.20 -> score ~3.6e6 beats the dup's ~3.3e6
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(-1f, 0f, 0f), 2L -> Seq(0f, -1f, 0f),
      3L -> Seq(0f, 0f, -1f), 4L -> Seq(-0.7f, -0.7f, 0f),
      10L -> Seq(0.9f, 0.436f, 0f),
      11L -> Seq(0.9f, 0.436f, 0f),
      12L -> Seq(0.6f, -0.78f, 0.179f))
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(1))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = SparkEntry.queries("ann_mmr_rerank")(spark, tmp)
      .where(col("query_id") === 0L).orderBy("rnk").collect()
    assert(out(0).getAs[Long]("vec_id") === 10L) // highest relevance first
    assert(out(1).getAs[Long]("vec_id") === 12L) // diversity beats the dup
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length === out.length)
  }
}

class SeasonalAnomalySpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("seasonal: a quiet weekday-profile day is only flagged vs its own weekday") {
    import spark.implicits._
    val tmp = TmpDirs.create("seas")
    // 5 weeks of type-x traffic: dow 6 runs at 5 events/day, other dows
    // at 100 — except day 27 (dow 6) bursts to 50 and day 10 (dow 3)
    // collapses to 10. A season-blind gate would flag EVERY dow-6 day.
    def n(d: Int): Int =
      if (d == 27) 50 else if (d == 10) 10 else if (d % 7 == 6) 5 else 100
    val rows = for { d <- 0 until 35; i <- 0 until n(d) }
      yield ((d * 1000 + i).toLong, (i % 7).toLong, d * 86400000000000L + i * 1000000L)
    val ev = rows.toDF("event_id", "user_id", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q_events_seasonal_anomaly")(spark, tmp).collect()
    assert(out.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"))).toSet
      === Set(("x", 10L), ("x", 27L)))
    val d27 = out.find(_.getAs[Long]("day") === 27L).get
    assert(d27.getAs[Long]("med") === 5L) // judged against its own weekday
  }
}

class SurvivalSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("kaplan-meier: hand-planted churn/censor cohort reproduces the exact curve") {
    import spark.implicits._
    val tmp = TmpDirs.create("surv")
    val day = 86400000000000L
    // corpus end = day 30 (u4's last event). churn horizon 7 days.
    // u1 churns at t=2, u2 at t=10; u3 (last event day 29.5) and u4
    // (first day 5, defines the end) are censored at t=30 / t=25
    val ev = Seq(
      (1L, 0L), (1L, 2 * day),
      (2L, 0L), (2L, 10 * day),
      (3L, 0L), (3L, 29 * day + day / 2),
      (4L, 5 * day), (4L, 30 * day))
    val df = ev.zipWithIndex.map { case ((u, ns), i) => (i.toLong, u, ns) }
      .toDF("event_id", "user_id", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q_events_survival")(spark, tmp).collect()
      .map(r => r.getAs[Long]("t_day") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("n_churned"),
          r.getAs[Long]("n_censored"), r.getAs[Long]("log_surv_q")))).toMap
    def qln(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    assert(out(2L) === ((4L, 1L, 0L, qln(3) - qln(4))))
    assert(out(10L) === ((3L, 1L, 0L, (qln(3) - qln(4)) + (qln(2) - qln(3)))))
    assert(out(25L)._1 === 2L && out(25L)._3 === 1L)
    assert(out(30L)._1 === 1L && out(30L)._3 === 1L)
    // censoring never moves the survival estimate
    assert(out(25L)._4 === out(10L)._4 && out(30L)._4 === out(10L)._4)
  }
}

class LabelPropSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("barbell graph: majority vote keeps the two triangles apart across the bridge") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .toDF("a", "b")
    val bidir = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val labels = graph.LabelProp.communities(bidir, rounds = 3)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels.unpersist()
    // hand-simulated sync LPA with min tie-break (3 rounds):
    assert(Set(1L, 2L, 3L).map(got) === Set(1L))
    assert(Set(4L, 5L, 6L).map(got) === Set(3L))
    // HashMin components would merge everything to one label; the
    // bridge must NOT do that here
    assert(got.values.toSet.size === 2)
  }
}

class ElasticitySpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("elasticity slope matches a per-brand recomputation from raw points") {
    val out = SparkEntry.queries("q_discount_elasticity")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"), r.getAs[Long]("slope_m")))).toMap
    val pts = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("cast(round(l_discount * 100) as bigint)").as("x"),
        expr("cast(round(l_quantity) as bigint)").as("y"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select("p_brand", "x", "y").collect()
      .groupBy(_.getString(0))
    val brand = pts.keys.min
    val xs = pts(brand).map(_.getLong(1)); val ys = pts(brand).map(_.getLong(2))
    val n = xs.length.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val den = n * sxx - sx * sx
    val want = if (den == 0) 0L else (n * sxy - sx * sy) * 1000 / den
    assert(out(brand) === ((n, want)))
  }
}

class IvfQualitySpec extends AnyFunSuite {
  import TestSpark._

  test("cell quality: totals reconcile, margins non-negative, planted tight cluster is cohesive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two obvious clusters around orthogonal axes + a bit of jitter;
    // ids 0/1 seed the two centroids (deterministic lowest-k init), so
    // id 0 must sit in the x-cluster and id 1 in the y-cluster
    val vecs: Seq[(Long, Seq[Float])] =
      Seq(0L -> Seq(1f, 0f, 0f), 1L -> Seq(0f, 1f, 0f)) ++
        (2L until 9L).map(i => i -> Seq(1f, 0.01f * (i - 2), 0f)) ++
        (9L until 16L).map(i => i -> Seq(0.01f * (i - 9), 1f, 0f))
    val tmp = TmpDirs.create("ivfq")
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(1))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val cents = ann.KMeans.fit(Tables.embeddings(spark, tmp), k = 2, iters = 1)
      .toSeq.map(_.toSeq)
    val out = ann.Ann.cellQuality(Tables.embeddings(spark, tmp), cents).collect()
    assert(out.map(_.getAs[Long]("n")).sum === 16L)
    assert(out.forall(_.getAs[Long]("avg_margin_u6") >= 0L))
    // both planted clusters are tight: cohesion >  0.99 in µ-units
    assert(out.forall(_.getAs[Long]("avg_cohesion_u6") > 990000L))
    assert(out.length === 2)
  }
}

class MixInterleaveSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("wfq interleave: positions follow hash/weight exactly; heavy source leads") {
    import spark.implicits._
    val tmp = TmpDirs.create("ilv")
    // source a: 100 docs x 8 words; source b: 25 docs x 8 words
    // sqrt-token weights 2:1 -> a should appear ~2x as often in the head
    val docs = ((0L until 100L).map(i => (i, "a")) ++ (100L until 125L).map(i => (i, "b")))
      .map { case (id, s) => (id, Seq.fill(8)(s"w$id").mkString(" "), "en", s) }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("pipe_mix_interleave")(spark, tmp).collect()
    assert(out.length === 100)
    // exact WFQ position of the first row, from first principles
    val r0 = out.head
    val h = graft.functions.Mix64(r0.getAs[Long]("doc_id")) >>> 16
    val st = if (r0.getAs[String]("source") == "a") 800.0 else 200.0
    assert(r0.getAs[Long]("pos_q") === (h.toDouble * 1000.0 / math.sqrt(st)).toLong)
    // proportionality: among the first 45, the heavy source dominates ~2:1
    val headA = out.take(45).count(_.getAs[String]("source") == "a")
    assert(headA > 22 && headA < 45, s"headA=$headA")
    // deterministic: re-run identical
    val again = SparkEntry.queries("pipe_mix_interleave")(spark, tmp).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}

class RqSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("rq: perfect clusters leave zero residual distortion; totals reconcile") {
    import spark.implicits._
    val tmp = TmpDirs.create("rq")
    // 16 distinct unit-ish vectors (ids 0..15 seed BOTH fit levels),
    // each repeated 3 more times -> every centroid equals its members,
    // every residual is exactly zero, so RQ distortion must be 0
    val base = (0 until 16).map(j => Seq.tabulate(8)(d => if (d == j % 8) 1f else 0.125f * j))
    val vecs = (0L until 64L).map(i => (i, base((i % 16).toInt)))
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(1))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = SparkEntry.queries("vec_rq_distortion")(spark, tmp).collect()
    assert(out.map(_.getAs[Long]("n")).sum === 64L)
    assert(out.map(_.getAs[Long]("total_sq")).sum === 0L)
    assert(out.forall(_.getAs[Long]("avg_sq") === 0L))
  }
}

class SourceLooSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("loo valuation: a failing source shows the exact +delta, a good one the -delta") {
    import spark.implicits._
    val tmp = TmpDirs.create("loo")
    // 10 docs that pass the Gopher gate (10 distinct words) and 10 that
    // fail it (3 words < the min-5 rule)
    val good = (0L until 10L).map(i => (i, (0 until 10).map(j => s"w$i$j").mkString(" "), "good"))
    val bad = (10L until 20L).map(i => (i, "tiny doc here", "bad"))
    (good ++ bad).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("pipe_source_loo")(spark, tmp).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("keep_pml"), r.getAs[Long]("loo_delta_pml")))).toMap
    // corpus keep = 10/20 = 500 pml; without bad: 10/10 = 1000 -> +500
    assert(out("bad") === ((0L, 500L)))
    assert(out("good") === ((1000L, -500L)))
  }
}

class RboSpec extends AnyFunSuite {
  import TestSpark._

  private def w(d: Int): Long = math.floor(1e9 * 0.1 * math.pow(0.9, d - 1) / d).toLong
  private def tSuffix(m: Int): Long = (m to 10).map(w).sum

  test("suffix-weight identity equals the textbook double sum on hand rankings") {
    // rankings as vec->rank maps over depth 10
    val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
      ((1L to 10L), (1L to 10L)),                      // identical
      ((1L to 10L), (10L to 1L by -1L)),               // reversed
      ((1L to 10L), (6L to 15L)),                      // half overlap
      ((1L to 10L), (11L to 20L)))                     // disjoint
    for ((a, b) <- cases) {
      val ra = a.zipWithIndex.map { case (v, i) => v -> (i + 1) }.toMap
      val rb = b.zipWithIndex.map { case (v, i) => v -> (i + 1) }.toMap
      val textbook = (1 to 10).map { d =>
        val ad = a.take(d).toSet; val bd = b.take(d).toSet
        w(d) * (ad & bd).size
      }.sum
      val suffix = (a.toSet & b.toSet).toSeq
        .map(v => tSuffix(math.max(ra(v), rb(v)))).sum
      assert(textbook === suffix, s"a=$a b=$b")
    }
  }

  test("operator emits one bounded row per query on real data") {
    val out = SparkEntry.queries("ann_rbo_eval")(spark, dir).collect()
    assert(out.length === 5)
    val maxRbo = (1 to 10).map(tSuffix).sum
    assert(out.forall { r =>
      val v = r.getAs[Long]("rbo_q"); v >= 0L && v <= maxRbo
    })
  }
}
