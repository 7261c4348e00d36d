package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R10: the former 64-source hard cap in the source-overlap bitmask
  * rollup is now sharded mask WORDS (⌈S/64⌉-long arrays) — VERDICT r9
  * watch item #3 made code. 70 planted sources force two mask words;
  * the intersection counts must match a string-level brute-force
  * gram equi-join exactly, including pairs whose indices straddle the
  * word boundary.
  */
/** R10 wave specs: brute-force replays and mechanism invariants for the
  * new operators, each independent of the implementation under test.
  */
class DpHistogramSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("noise is bounded by the table support and the release is reproducible") {
    val out = SparkEntry.queries("q_dp_histogram")(spark, dir).collect()
    assert(out.nonEmpty)
    // true counts recomputed directly; |noise| <= 12 (table support)
    val truth = Tables.orders(spark, dir)
      .groupBy(month(col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("c"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      val (n, c) = truth(r.getInt(0))
      assert(math.abs(r.getLong(1) - n) <= 12, s"order noise out of support at mon ${r.getInt(0)}")
      assert(math.abs(r.getLong(2) - c) <= 12, s"cust noise out of support at mon ${r.getInt(0)}")
    }
    // reproducible-DP: a rerun ships the identical protected artifact
    val again = SparkEntry.queries("q_dp_histogram")(spark, dir).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // and the noise actually fires somewhere (non-vacuous): at least one
    // cell differs from truth across the 24 released counts
    assert(out.exists(r =>
      r.getLong(1) != truth(r.getInt(0))._1 || r.getLong(2) != truth(r.getInt(0))._2))
  }
}

class BlocklistSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("hit counts replay brute-force from the canonical tokenization") {
    val out = SparkEntry.queries("text_blocklist_filter")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
    assert(docs.length === out.size)
    var hitDocs = 0
    var phraseDocs = 0
    docs.foreach { r =>
      val words = r.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
      val singles = words.filter(w => w == "slow" || w == "dup")
      val bigrams =
        if (words.isEmpty) Seq.empty
        else if (words.length <= 2) Seq(words.mkString(" "))
        else words.sliding(2).map(_.mkString(" ")).toSeq
      val phrases = bigrams.filter(_ == "batch batch")
      val nHits = (singles ++ phrases).size.toLong
      val nTerms = (singles ++ phrases).distinct.size.toLong
      val (gotHits, gotTerms, keep) = out(r.getLong(0))
      assert(gotHits === nHits, s"doc ${r.getLong(0)} hits")
      assert(gotTerms === nTerms, s"doc ${r.getLong(0)} terms")
      assert(keep === (nHits == 0L))
      if (nHits > 0) hitDocs += 1
      if (phrases.nonEmpty) phraseDocs += 1
    }
    // non-vacuous: the corpus actually contains single-word AND phrase hits
    assert(hitDocs > 0 && phraseDocs > 0)
  }
}

class KappaSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("kappa_pml replays from the published confusion matrix") {
    val cm = SparkEntry.queries("text_langid_eval")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val n = cm.values.sum
    val agree = cm.collect { case ((a, b), c) if a == b => c }.sum
    val rt = cm.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cm.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val pe = rt.keys.map(l => rt(l) * ct.getOrElse(l, 0L)).sum
    val want = (n * agree - pe) * 1000L / (n * n - pe)
    val row = SparkEntry.queries("text_classifier_kappa")(spark, dir).head()
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === agree)
    assert(row.getLong(2) === pe)
    assert(row.getLong(3) === want)
    // κ must be strictly below raw agreement permille (chance-corrected)
    assert(row.getLong(3) < agree * 1000L / n)
  }
}

class AudioMatchSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("decoded-PCM fingerprints recover exactly the planted doc_id % 50 classes") {
    val out = SparkEntry.queries("mm_audio_match")(spark, dir).collect()
    val ids = Tables.documents(spark, dir).select("doc_id").collect().map(_.getLong(0))
    val want = ids.groupBy(_ % 50).map { case (_, g) => g.min -> g.length.toLong }
    assert(out.length === want.size) // one group per recording id — no split, no merge
    out.foreach { r =>
      assert(want(r.getLong(0)) === r.getLong(1), s"group at anchor ${r.getLong(0)}")
    }
    // distinct recordings must NOT collide: group count == distinct recs
    assert(out.map(_.getLong(0)).distinct.length === want.size)
  }
}

class HedgeMixSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("hedge update conserves permille mass and boosts the top-divergence source") {
    val out = SparkEntry.queries("pipe_hedge_mix")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // trunc-permille shares each sum to (1000 - S, 1000]
    assert(out.map(_._2).sum <= 1000L && out.map(_._2).sum > 1000L - out.length)
    assert(out.map(_._4).sum <= 1000L && out.map(_._4).sum > 1000L - out.length)
    assert(out.forall(r => r._3 >= 0L && r._3 <= 9L))
    // the maximally-boosted source can only gain relative share
    val top = out.filter(_._3 == 9L)
    assert(top.nonEmpty)
    top.foreach(r => assert(r._4 >= r._2, s"boosted source ${r._1} lost share"))
  }
}

class CoocGraphSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("top-50 PMI edges replay brute-force from raw text") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
    def words(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").filter(_.nonEmpty).toSeq
    val dw = docs.toSeq.flatMap(r => words(r.getString(1)).distinct.map(w => (r.getLong(0), w)))
    val df = dw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byDoc = dw.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val top = byDoc.view.mapValues(ws =>
      ws.sortBy(w => (df(w), w)).take(10)).toMap
    val pairs = top.values.flatMap { ws =>
      for (a <- ws; b <- ws if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def qln(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    val d = docs.length.toLong
    val scored = pairs.map { case ((a, b), c) =>
      (a, b, c, qln(c) + qln(d) - qln(df(a)) - qln(df(b)))
    }.toSeq.sortBy(t => (-t._4, t._1, t._2)).take(50)
    val out = SparkEntry.queries("text_cooc_graph")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out === scored)
  }
}

class ReachDistSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("4 seeds, hop-0 singleton, hop counts positive") {
    val out = SparkEntry.queries("q_graph_reach_dist")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val seeds = out.map(_._1).distinct
    assert(seeds.length === 4)
    seeds.foreach { s =>
      val hops = out.filter(_._1 == s).map(h => h._2 -> h._3).toMap
      assert(hops(0L) === 1L) // the seed itself
      assert(hops.values.forall(_ > 0L))
      // the planted co-purchase graph is dense: hop 1 reaches something
      assert(hops.contains(1L))
    }
  }
}

/** Change-point spec: the exact rational argmax must equal a brute-force
  * driver-side binary-segmentation over the collected daily counts.
  */
class ChangepointSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("split day replays brute-force SSE minimization per type") {
    val dayNs = 86400000000000L
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(s"ts_ns div $dayNs").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val allDays = daily.map(_._2).distinct.sorted
    val types = daily.map(_._1).distinct
    val expect = types.flatMap { t =>
      val m = daily.filter(_._1 == t).map(r => r._2 -> r._3).toMap
      val xs = allDays.map(d => d -> m.getOrElse(d, 0L))
      if (xs.length < 2) None
      else {
        // brute force with exact BigInt rationals — an independent
        // arithmetic path from the operator's cross-multiplied longs
        val cand = (1 until xs.length).map { i =>
          val (l, r) = xs.splitAt(i)
          val (s1, n1) = (l.map(_._2).sum, l.size.toLong)
          val (s2, n2) = (r.map(_._2).sum, r.size.toLong)
          (xs(i - 1)._1,
            BigInt(s1) * s1 * n2 + BigInt(s2) * s2 * n1, BigInt(n1) * n2,
            s1, n1, s2, n2)
        }
        val top = cand.reduceLeft { (a, b) =>
          if (b._2 * a._3 > a._2 * b._3) b
          else if (b._2 * a._3 == a._2 * b._3 && b._1 < a._1) b
          else a
        }
        Some((t, top._1, top._4 * 1000 / top._5, top._6 * 1000 / top._7))
      }
    }.sortBy(_._1)
    val out = SparkEntry.queries("q_events_changepoint")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out === expect)
    assert(out.nonEmpty)
    // the split is informative somewhere: at least one type's means differ
    assert(out.exists(r => r._3 != r._4))
  }
}

class BlurScoreSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("Laplacian sums replay the pixel formula through the real decode") {
    val out = SparkEntry.queries("mm_blur_score")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out.nonEmpty)
    def px(id: Long, x: Int, y: Int): Long = (id * 31 + x * 7 + y * 13) % 256
    out.foreach { case (id, (w, h, n, s, s2, varQ)) =>
      assert(w === 8 + (id % 9).toInt && h === 8 + ((id / 3) % 7).toInt)
      var (en, es, es2) = (0L, 0L, 0L)
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
        val l = 4 * px(id, x, y) - px(id, x - 1, y) - px(id, x + 1, y) -
          px(id, x, y - 1) - px(id, x, y + 1)
        en += 1; es += l; es2 += l * l
      }
      assert((n, s, s2) === ((en, es, es2)), s"doc $id")
      assert(varQ === (en * es2 - es * es) / (en * en))
    }
    // the gate separates: scores are not all equal (a blur gate that
    // cannot rank is useless)
    assert(out.values.map(_._6).toSet.size > 1)
  }
}

class StitchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("planted split docs stitch; boilerplate-capped grams do not") {
    // docs 1→2 and 3→4 split mid-stream (tail 3-gram == head 3-gram);
    // docs 100.. all share one viral boilerplate head/tail gram that the
    // df cap must suppress
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "delta epsilon zeta eta theta iota"),
      (3L, "one two three four five six"),
      (4L, "four five six seven eight nine"),
      (5L, "totally unrelated content words here now")) ++
      (100L to 250L).map(i => (i, s"footer legal text unique$i middle footer legal text"))
    val tmp = graft.TmpDirs.create("stitch")
    planted.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("text_stitch_candidates")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)) && out.contains((3L, 4L)))
    // the 151-doc boilerplate gram is over the df cap: no pair from it
    assert(!out.exists { case (a, b) => a >= 100L || b >= 100L })
    assert(!out.exists { case (a, b) => a == 5L || b == 5L })
  }
}

class IvfRqSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("ivf-rq probe: 10 ranked hits per query, self excluded, useful recall") {
    val out = SparkEntry.queries("ann_ivfrq_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).distinct.length === 5)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length === 10)
      assert(rows.forall(_._2 != q)) // never retrieves itself
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1L to 10L))
      // adist non-decreasing with rank (the index's own order is honest)
      assert(byRank.map(_._3).sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    }
    val rec = SparkEntry.queries("ann_ivfrq_recall")(spark, dir).collect()
      .map(r => r.getLong(3))
    assert(rec.forall(r => r >= 0L && r <= 1000L))
    // the composite index must beat the degenerate floor somewhere
    assert(rec.max > 0L)
  }
}

/** Streaming DP twin: exact counts maintained by the stream, noise at
  * the PUBLISH boundary only — noising per micro-batch would compose ε
  * per batch. Stream release ≡ batch release, and re-publishing re-draws
  * the identical noise (spends nothing).
  */
class DpStreamSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("streaming DP release equals the batch release; republish is free") {
    val streamed = streaming.DpStream.noisyDailyCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dayNs = 86400000000000L
    val batch = ops.DpNoise.noise(col("day")) // same kernel, batch plan
    val expect = Tables.events(spark, dir)
      .select(expr(s"ts_ns div $dayNs").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .select(col("day"), (col("n") + batch).as("n_dp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === expect)
    assert(streamed.nonEmpty)
    // republish = identical artifact (the deterministic-noise contract)
    val again = streaming.DpStream.noisyDailyCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === streamed)
  }
}

/** Streaming ANN serving twin: per-micro-batch probes of the persisted
  * PQ index must equal the one-shot batch probe over the same queries.
  */
class AnnServeStreamSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("streamed probes of the persisted index equal the batch probe") {
    val idx = graft.TmpDirs.create("annserveidx") + "/pq"
    ann.Pq.Index.build(Tables.embeddings(spark, dir), idx)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val streamed = streaming.AnnServeStream.serve(spark, dir, idx, qids)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val qs = Tables.embeddings(spark, dir)
      .where(col("vec_id").isInCollection(qids))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val batch = ann.Pq.Index.topK(spark, idx, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}

/** The shared-shingle-prefix rewrite of dedup_minhash_eval (VERDICT r9
  * #5) is only sound if `MinHashSig(shingle_block(text).sh)` reproduces
  * the fused `TextShingleMinHash(text)` signature bit-for-bit: same
  * WordWalk/FNV/Mix64 shingle kernel, same affine permutations, and the
  * min is invariant to ShingleBlock's sort+dedup. Asserted over a real
  * corpus including empty/degenerate texts (both paths must agree on
  * null too).
  */
class MinHashFromSetsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("minhash_sig over shingle_block equals the fused text path bit-for-bit") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001").select("text")
    val degenerate = Seq("", "   ", "?!.,", "one", "two words",
      "Üñïçødé tëxt with Mixed CASE and 123 numbers").toDF("text")
    val docs = real.unionByName(degenerate)
    val mismatches = docs.select(
      functions.exprs.text_minhash_sig(col("text")).as("a"),
      functions.exprs.minhash_sig(
        functions.exprs.shingle_block(col("text"), 3).getField("sh")).as("b"))
      .where(not(col("a") <=> col("b")))
      .count()
    assert(mismatches === 0L)
  }
}

class SourceOverlapShardSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("mask sharding is exact at 70 sources (two 64-bit words)") {
    val base = (1 to 12).map(i => s"base$i").mkString(" ")
    // sources 2k and 2k+1 are textually identical (Jaccard 1000‰);
    // every source shares the 5 pure-base 8-grams with everyone else
    val docs = (0 until 70).map { i =>
      (f"s$i%03d", s"$base tag${i / 2} tail1 tail2 tail3 tail4 tail5 tail6 tail7")
    }.toDF("source", "text")
    val out = pipeline.SourceOverlap.matrix(docs, n = 8)
      .select("src_a", "src_b", "inter", "jaccard_permille")
    // brute-force truth at the string level (no hashing, no masks)
    val g = docs.select(col("source"),
      explode(text.Text.shinglesOfWords(text.Text.words(col("text")), 8)).as("g"))
      .distinct()
    val truth = g.as("a")
      .join(g.as("b"), col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("ti"))
    val tm = truth.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // the plant actually fired: overlapping pairs exist on both sides of
    // the 64-index word boundary (vacuous-assertion lesson, VERDICT #8)
    assert(tm.nonEmpty && tm.exists { case ((a, b), _) => a < "s064" && b >= "s064" })
    val rows = out.collect()
    assert(rows.length === 70 * 69 / 2) // every unordered pair reported
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === tm.getOrElse(key, 0L), s"inter mismatch at $key")
    }
    // identical twins straddle nothing: (s000,s001) and the boundary
    // pair (s064,s065) both sit in one word; (s063,s064) straddles.
    val jm = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(jm(("s000", "s001")) === 1000L)
    assert(jm(("s064", "s065")) === 1000L)
    assert(jm(("s063", "s064")) < 1000L && jm(("s063", "s064")) > 0L)
  }
}

/** With `q_stock_value` (Q11) and `q_promo_parts` (Q20) the surface now
  * covers all 22 TPC-H plan shapes. Both specs replay the thresholds
  * brute-force in driver Scala from raw table collects — independent of
  * the Spark plans under test — and assert the plants fired (non-empty
  * qualifying sets on BOTH sides of each threshold).
  */
class TpchCompletionSpec extends AnyFunSuite {
  import TestSpark._
  // sf0.01: at sf0.001 NATION_7 ships so few distinct parts that no part
  // clears 2x the mean and the non-vacuity assert (rightly) trips
  private val dir = "/root/testdata/sf0.01"

  // key columns vary int32/int64 across testdata generations
  private def kLong(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i).asInstanceOf[Number].longValue

  test("q_stock_value keeps exactly the parts above 2x the mean value") {
    // replay the top-supplying-nation anchor
    val nations = Tables.nation(spark, dir).collect()
      .map(r => kLong(r, 0) -> r.getString(1)).toMap
    val supByNation = Tables.supplier(spark, dir).collect()
      .groupBy(r => nations(kLong(r, 2)))
    val topNation = supByNation.toSeq
      .map { case (n, rs) => (n, rs.length) }
      .sortBy { case (n, c) => (-c, n) }.head._1
    val nk = Tables.nation(spark, dir).where(col("n_name") === topNation)
      .collect().map(kLong(_, 0)).toSet
    val sup = Tables.supplier(spark, dir).collect()
      .filter(r => nk(kLong(r, 2))).map(kLong(_, 0)).toSet
    val per = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .filter(r => sup(kLong(r, 1)))
      .groupBy(kLong(_, 0))
      .map { case (p, rs) => p -> rs.map(r => math.round(r.getDouble(2) * 100)).sum }
    val total = per.values.sum
    val n = per.size.toLong
    val expect = per.filter { case (_, v) => v * n > 2L * total }
    val got = SparkEntry.queries("q_stock_value")(spark, dir).collect()
      .map(r => kLong(r, 0) -> r.getLong(1)).toMap
    assert(got === expect)
    // non-vacuous: the threshold separates (some parts pass, some fail)
    assert(expect.nonEmpty && expect.size < per.size)
    // ordering: value desc, then partkey
    val rows = SparkEntry.queries("q_stock_value")(spark, dir).collect()
      .map(r => (r.getLong(1), kLong(r, 0)))
    assert(rows.sortBy { case (v, p) => (-v, p) }.toSeq === rows.toSeq)
  }

  test("q_promo_parts finds exactly the >50%-dominance suppliers") {
    val pr = Tables.part(spark, dir).collect()
      .filter(_.getString(1).startsWith("small")).map(kLong(_, 0)).toSet
    // epoch-micros window bounds; robust to Timestamp vs LocalDateTime rows
    def micros(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime * 1000L
      case d: java.time.LocalDateTime =>
        d.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
          d.getNano / 1000L
      case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val lo = java.time.Instant.parse("1997-01-01T00:00:00Z").getEpochSecond * 1000000L
    val hi = java.time.Instant.parse("1998-01-01T00:00:00Z").getEpochSecond * 1000000L
    val l = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate").collect()
      .filter { r =>
        val ts = micros(r.get(3))
        pr(kLong(r, 0)) && ts >= lo && ts < hi
      }
      .map(r => (kLong(r, 0), kLong(r, 1), math.round(r.getDouble(2) * 100)))
    val perPart = l.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._3).sum }
    val dominating = l.groupBy(t => (t._1, t._2))
      .collect { case ((p, s), rs) if rs.map(_._3).sum * 2 > perPart(p) => s }
      .toSet
    val got = SparkEntry.queries("q_promo_parts")(spark, dir).collect()
    assert(got.map(kLong(_, 0)).toSet === dominating)
    assert(got.map(kLong(_, 0)).toSeq === got.map(kLong(_, 0)).toSeq.sorted)
    // non-vacuous: dominance separates the supplier population
    val nSup = Tables.supplier(spark, dir).count()
    assert(dominating.nonEmpty && dominating.size < nSup)
  }
}

/** Wave-B statistical gates: each replayed independently in driver Scala
  * (BigInt where the formula allows it) from raw collects.
  */
class StatGatesSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("q_trend_mann_kendall matches a BigInt pairwise replay") {
    val dayNs = 86400000000000L
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(s"ts_ns div $dayNs").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val got = SparkEntry.queries("q_trend_mann_kendall")(spark, dir).collect()
    assert(got.map(_.getString(0)).toSet === byType.keySet)
    got.foreach { r =>
      val series = byType(r.getString(0)).sortBy(_._2).map(_._3)
      val n = series.length.toLong
      var sS = BigInt(0)
      for (i <- series.indices; j <- (i + 1) until series.length)
        sS += series(j).compare(series(i)).sign
      val tie = series.groupBy(identity).values
        .map(g => { val t = BigInt(g.length); t * (t - 1) * (2 * t + 5) }).sum
      val varX18 = BigInt(n) * (n - 1) * (2 * n + 5) - tie
      assert(r.getLong(1) === n, s"${r.getString(0)} n_days")
      assert(BigInt(r.getLong(2)) === sS, s"${r.getString(0)} s_stat")
      assert(BigInt(r.getLong(3)) === varX18, s"${r.getString(0)} var")
      val dirn = if (sS > 0) "up" else if (sS < 0) "down" else "flat"
      assert(r.getString(4) === dirn)
    }
    // non-vacuous: at least one type trends (|S| large enough to matter)
    assert(got.exists(_.getString(4) != "flat"))
  }

  test("q_values_benford replays the digit histogram and Benford constants") {
    val digits = Tables.orders(spark, dir).select("o_totalprice").collect()
      .map(r => math.round(r.getDouble(0) * 100).toString.head.asDigit.toLong)
    val hist = digits.groupBy(identity).map { case (d, a) => d -> a.length.toLong }
    val total = digits.length.toLong
    val exp = Map(1L -> 301L, 2L -> 176L, 3L -> 124L, 4L -> 96L, 5L -> 79L,
      6L -> 66L, 7L -> 57L, 8L -> 51L, 9L -> 45L)
    // the constants really are floor(1000*log10(1+1/d))
    exp.foreach { case (d, e) =>
      assert(math.floor(1000 * math.log10(1 + 1.0 / d)).toLong === e)
    }
    val got = SparkEntry.queries("q_values_benford")(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq === (1L to 9L))
    got.foreach { r =>
      val d = r.getLong(0)
      val n = hist.getOrElse(d, 0L)
      assert(r.getLong(1) === n, s"digit $d count")
      assert(r.getLong(2) === n * 1000 / total)
      assert(r.getLong(3) === exp(d))
      assert(r.getLong(4) === n * 1000 / total - exp(d))
    }
  }

  test("samp_neyman allocates exactly the budget by N_h * S_h") {
    val rows = SparkEntry.queries("samp_neyman")(spark, dir).collect()
    assert(rows.map(_.getLong(4)).sum === 1000L, "allocation must sum to the budget exactly")
    // replay: integer population variance + exact isqrt per stratum
    val per = Tables.documents(spark, dir).select("source", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (src, rs) =>
        val xs = rs.map(_.getLong(1))
        val n = xs.length.toLong
        val sx = xs.sum
        val sxx = xs.map(x => x * x).sum
        val v = (n * sxx - sx * sx) / (n * n)
        val sd = BigInt(v).bigInteger.sqrt().longValueExact()
        src -> (n, sd, n * sd)
      }
    rows.foreach { r =>
      val (n, sd, w) = per(r.getString(0))
      assert(r.getLong(1) === n); assert(r.getLong(2) === sd, s"${r.getString(0)} isqrt")
      assert(r.getLong(3) === w)
    }
    // Neyman ordering: floor shares respected within +/- 1 (largest remainder)
    val wTot = per.values.map(_._3).sum
    rows.foreach { r =>
      val base = per(r.getString(0))._3 * 1000L / wTot
      assert(r.getLong(4) === base || r.getLong(4) === base + 1)
    }
    // non-vacuous: strata differ (some get more than a proportional-by-N share)
    assert(rows.map(_.getLong(2)).distinct.length > 1 || rows.length == 1)
  }
}

/** Wave-C eval keys: confusion-fold consistency, an int8 recall replay,
  * and a full driver-Scala personalized-PageRank replay.
  */
class WaveCSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("dedup_simhash_eval folds are consistent with the standalone keys") {
    val r = SparkEntry.queries("dedup_simhash_eval")(spark, dir).head()
    val (nPred, nTruth, tp, fp, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(tp + fp === nPred && tp + fn === nTruth)
    assert(nPred === SparkEntry.queries("dedup_simhash")(spark, dir).count())
    assert(nTruth === SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).count())
    assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000)
    assert(r.getLong(6) >= 0 && r.getLong(6) <= 1000)
    // non-vacuous: both legs produce pairs on this corpus
    assert(nPred > 0 && nTruth > 0)
  }

  test("vec_int8_recall replays against a driver-Scala int8 top-10") {
    val embs = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def q(v: Array[Float]): Array[Long] = v.map(x => math.round(x.toDouble * 1000))
    def int8(v: Array[Float]): Array[Long] = {
      val qq = q(v)
      val n = qq.map(x => x * x).sum
      if (n == 0L) qq.map(_ => 0L)
      else qq.map(x => math.round(x.toDouble * 127.0 / math.sqrt(n.toDouble)))
    }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val n2 = a.map(x => x * x).sum * b.map(x => x * x).sum
      if (n2 == 0L) 0.0
      else BigDecimal(a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
        math.sqrt(n2.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val qm = embs.map { case (id, v) => id -> q(v) }.toMap
    val im = embs.map { case (id, v) => id -> int8(v) }.toMap
    def top10(scores: Seq[(Long, Double)]): Set[Long] =
      scores.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val got = SparkEntry.queries("vec_int8_recall")(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    got.foreach { r =>
      val qid = r.getLong(0)
      val truth = top10(embs.collect { case (id, _) if id != qid => id -> cos(qm(qid), qm(id)) })
      val approx = top10(embs.collect { case (id, _) if id != qid => id -> cos(im(qid), im(id)) })
      val hits = (truth & approx).size.toLong
      assert(r.getLong(1) === 10L)
      assert(r.getLong(2) === hits, s"query $qid hits")
      assert(r.getLong(3) === hits * 1000 / 10)
    }
    // non-vacuous: int8 at 64 dims must retain most of the neighborhood
    assert(got.map(_.getLong(3)).sum >= 2500L)
  }

  test("q_graph_ppr replays 3 integer PPR iterations from raw lineitem") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue)).distinct
    val und = scala.collection.mutable.Set[(Long, Long)]()
    li.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).distinct.sorted
      var i = 0
      while (i < ps.length) {
        var j = i + 1
        while (j < ps.length) { und += ((ps(i), ps(j))); j += 1 }
        i += 1
      }
    }
    val edges = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = edges.map(_._1).toSet
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val seed = deg.toSeq.sortBy { case (n, d) => (-d, n) }.head._1
    val scale = 1000000000000L
    var rank = nodes.map(n => n -> (if (n == seed) scale else 0L)).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s0, d0) => contrib(d0) += rank(s0) / deg(s0) }
      rank = nodes.map(n =>
        n -> ((if (n == seed) scale * 15L / 100L else 0L) + 85L * contrib(n) / 100L)).toMap
    }
    val want = rank.toSeq.sortBy { case (n, r) => (-r, n) }.take(20)
    val got = SparkEntry.queries("q_graph_ppr")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want)
    val seeds = SparkEntry.queries("q_graph_ppr")(spark, dir).collect().map(_.getLong(0)).distinct
    assert(seeds.toSeq === Seq(seed))
    // the seed must top its own personalized ranking
    assert(got.head._1 === seed)
  }
}

/** Wave-D: compaction mechanism, HT estimator replay, and the streaming
  * Benford twin's stream ≡ batch equality.
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("compaction collapses the planted small files losslessly") {
    val tmp = TmpDirs.create("cmpspec")
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "n_chars", "text")
    docs.repartition(64).write.parquet(s"$tmp/small")
    val before = sinks.Compaction.dataFileCount(spark, s"$tmp/small")
    assert(before === 64) // the pathology actually planted
    val n = sinks.Compaction.compact(spark, s"$tmp/small", s"$tmp/big", 32L * 1024 * 1024)
    val after = sinks.Compaction.dataFileCount(spark, s"$tmp/big")
    assert(after === n && after < before)
    // lossless: content identical both directions
    val back = spark.read.parquet(s"$tmp/big")
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // sized from REAL bytes: n == ceil(on-disk / target)
    val bytes = sinks.Compaction.dataBytes(spark, s"$tmp/small")
    assert(n === math.max(1, math.ceil(bytes.toDouble / (32L * 1024 * 1024)).toInt))
  }
}

class HtEstimateSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("HT folds are consistent with samp_recency and the weights are exact") {
    val ht = SparkEntry.queries("samp_ht_estimate")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val rec = SparkEntry.queries("samp_recency")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ht.keySet === rec.keySet)
    ht.foreach { case (wk, r) =>
      // same sampling decisions as the proven recency key
      assert((r.getLong(1), r.getLong(2)) === rec(wk), s"week $wk totals/kept")
      // uniform-p weeks reconstruct exactly: n_kept * (1e6 div p) — weeks
      // spanning the age knee mix two p values, so only bounds hold there
      assert(r.getLong(3) >= r.getLong(2) * 1000L, s"week $wk HT below kept mass")
    }
    // non-vacuous: estimator error is small where p is high (week 0: p≈1)
    val w0 = ht(0L)
    assert(math.abs(w0.getLong(6)) <= 100L, "week-0 HT error above 10%")
  }
}

class BenfordStreamSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("streamed digit release equals the batch key after the source drains") {
    val batch = SparkEntry.queries("q_values_benford")(spark, dir).collect()
      .map(_.toString).toSeq
    val streamed = streaming.BenfordStream.run(spark, dir).collect()
      .map(_.toString).toSeq
    assert(streamed === batch)
    assert(batch.size === 9)
  }
}

/** Wave-E: multi-probe LSH must dominate single-probe recall per query,
  * and the bucketed-join KEY (not just the mechanism spec) must plan
  * its fact-fact join without a shuffle exchange below the aggregate.
  */
class WaveESpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("multi-probe recall >= single-probe recall for every query") {
    val single = SparkEntry.queries("ann_lsh_recall")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val multi = SparkEntry.queries("ann_lsh_multiprobe_recall")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(multi.keySet === single.keySet)
    multi.foreach { case (q, r) =>
      assert(r >= single(q), s"query $q: multiprobe $r < singleprobe ${single(q)}")
    }
    // non-vacuous: the extra probes actually recover something somewhere
    assert(multi.values.sum > single.values.sum,
      "multiprobe recovered nothing over single-probe on this corpus")
    // and the candidate sets really are supersets (same bucket family)
    val sc = SparkEntry.queries("ann_lsh_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mcAll = ann.Ann.lshMultiprobeTopK(
      Tables.embeddings(spark, dir), Seq(0L, 1L, 2L, 3L, 4L), k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sc.subsetOf(mcAll), "flip-0 probe must reproduce the single-probe bucket")
  }

  test("snk_bucketed_join plans no shuffle below the final aggregate") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("snk_bucketed_join")(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      // exactly the aggregate/sort exchanges survive; the JOIN itself
      // must read the pre-bucketed layout with no hashpartitioning on
      // the join keys
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"join shuffled despite bucketing:\n$plan")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

/** Wave-F: estimator-accuracy eval replays — the minhash-estimate fold
  * recomputed from string-level sets, and modularity from a full
  * driver-Scala label-propagation replay.
  */
class WaveFSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("dedup_minhash_estimate fold replays from string-level shingle sets") {
    def canonWords(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").filter(_.nonEmpty).toSeq
    def shingleSet(t: String): Set[String] = {
      val w = canonWords(t)
      if (w.isEmpty) Set.empty
      else if (w.length <= 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingleSet(r.getString(1))).toMap
    val cand = SparkEntry.queries("dedup_minhash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1000)))
    assert(cand.nonEmpty)
    val folds = cand.map { case (a, b, est) =>
      val inter = (sets(a) & sets(b)).size.toLong
      val uni = sets(a).size.toLong + sets(b).size.toLong - inter
      val exact = inter * 1000 / uni
      (math.abs(est - exact), est - exact)
    }
    val row = SparkEntry.queries("dedup_minhash_estimate")(spark, dir).head()
    assert(row.getLong(0) === cand.length.toLong)
    assert(row.getLong(1) === folds.map(_._1).sum)
    assert(row.getLong(2) === folds.map(_._1).sum / cand.length)
    assert(row.getLong(3) === folds.map(_._1).max)
    assert(row.getLong(4) === folds.map(_._2).sum)
    // the sketch must actually be informative on this corpus
    assert(row.getLong(2) <= 200L, s"minhash MAE ${row.getLong(2)}permille is useless")
  }

  test("q_graph_modularity replays labelprop + Newman Q from raw lineitem") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue)).distinct
    val und = scala.collection.mutable.Set[(Long, Long)]()
    li.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).distinct.sorted
      var i = 0
      while (i < ps.length) {
        var j = i + 1
        while (j < ps.length) { und += ((ps(i), ps(j))); j += 1 }
        i += 1
      }
    }
    val bidir = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = bidir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keySet
    var lbl: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = nodes.map { n =>
        val counts = adj(n).groupBy(lbl).view.mapValues(_.size.toLong).toMap
        n -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }.toMap
    }
    val m = und.size.toLong
    val eC = und.toSeq.filter { case (a, b) => lbl(a) == lbl(b) }
      .groupBy(p => lbl(p._1)).view.mapValues(_.size.toLong).toMap
    val dC = nodes.groupBy(lbl).view
      .mapValues(_.toSeq.map(n => adj(n).size.toLong).sum).toMap
    val qNum = dC.map { case (c, d) => 4L * m * eC.getOrElse(c, 0L) - d * d }.sum
    val row = SparkEntry.queries("q_graph_modularity")(spark, dir).head()
    assert(row.getLong(0) === m)
    assert(row.getLong(1) === dC.size.toLong)
    assert(row.getLong(2) === qNum)
    assert(row.getLong(3) === 4L * m * m)
    assert(row.getLong(4) === qNum * 1000 / (4L * m * m))
  }
}

/** Wave-G sweeps: monotonicity + consistency with the production-point
  * operators they parameterize.
  */
class WaveGSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("session sweep is monotone and its 1800s point equals the session key") {
    val rows = SparkEntry.queries("q_events_session_sweep")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq(300L, 900L, 1800L, 3600L))
    // wider gap => fewer (or equal) sessions; events total constant
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"sessions must not grow with the gap: $a -> $b")
      assert(a._3 === b._3)
    }
    val prod = rows.find(_._1 == 1800L).get._2
    val fromKey = SparkEntry.queries("q_events_session")(spark, dir)
      .agg(sum("n_sessions")).head().getLong(0)
    assert(prod === fromKey, "sweep's 1800s point must equal q_events_session")
  }

  test("IVF recall is monotone in nProbe and the nProbe=4 point matches ann_recall_eval") {
    val rows = SparkEntry.queries("ann_ivf_nprobe_sweep")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val probes = Seq(1L, 2L, 4L, 8L)
    (0L to 4L).foreach { q =>
      probes.sliding(2).foreach { case Seq(a, b) =>
        assert(rows((b, q)) >= rows((a, q)),
          s"query $q: recall must not drop from nProbe $a to $b")
      }
    }
    val standalone = SparkEntry.queries("ann_recall_eval")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    (0L to 4L).foreach { q =>
      assert(rows((4L, q)) === standalone(q),
        s"query $q: sweep's nProbe=4 point must equal ann_recall_eval")
    }
  }
}

/** Wave-H: A/B fold + chi-square replay, and the simplified-silhouette
  * geometry replayed from raw embeddings.
  */
class WaveHSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("q_events_abtest replays the 2x2 fold and chi-square in driver Scala") {
    val perUser = Tables.events(spark, dir).select("user_id", "event_type").collect()
      .groupBy(_.getLong(0)).map { case (u, rs) =>
        u -> (if (rs.count(_.getString(1) == "purchase") >= 14) 1L else 0L)
      }
    def grp(u: Long): Long = (functions.Mix64(u) >>> 32) % 2
    val arms = perUser.groupBy { case (u, _) => grp(u) }
      .map { case (g, m) => g -> (m.size.toLong, m.values.sum) }
    val a = arms(0L)._2; val b = arms(0L)._1 - arms(0L)._2
    val c = arms(1L)._2; val d = arms(1L)._1 - arms(1L)._2
    val den = (a + b).toDouble * (c + d).toDouble * (a + c).toDouble * (b + d).toDouble
    val num = (a + b + c + d).toDouble *
      (a.toDouble * d.toDouble - b.toDouble * c.toDouble) *
      (a.toDouble * d.toDouble - b.toDouble * c.toDouble)
    val chi2 = if (den == 0.0) 0.0
      else BigDecimal(num / den).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = SparkEntry.queries("q_events_abtest")(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    got.foreach { r =>
      val (nU, nC) = arms(r.getLong(0))
      assert(r.getLong(1) === nU && r.getLong(2) === nC)
      assert(r.getLong(3) === nC * 1000 / nU)
      assert(r.getDouble(4) === chi2)
    }
    // non-vacuous: both outcomes occur in both arms (the 2x2 is full)
    assert(a > 0 && b > 0 && c > 0 && d > 0, s"degenerate table a=$a b=$b c=$c d=$d")
  }

  test("vec_silhouette replays best/second-best geometry from raw embeddings") {
    val embs = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val cents = embs.filter(_._1 < 16).map(_._2.map(_.toDouble))
    def score(v: Array[Float], c: Array[Double]): Double = {
      var dot = 0.0; var i = 0
      while (i < c.length) { dot += v(i).toDouble * c(i); i += 1 }
      val nv = v.map(x => x.toDouble * x.toDouble).sum
      val nc = math.sqrt(c.map(x => x * x).sum)
      if (nv == 0.0) -2.0 else dot / (math.sqrt(nv) * nc)
    }
    val want = embs.map { case (_, v) =>
      val ss = cents.map(c => score(v, c)).zipWithIndex
        .sortBy { case (sc, i) => (-sc, i) }
      val (own, cell) = ss(0); val (second, _) = ss(1)
      val denom = math.max(1.0 - own, 1.0 - second)
      val s = if (denom == 0.0) 0.0 else (own - second) / denom
      cell.toLong -> math.round(s * 1000000)
    }
    val agg = want.groupBy(_._1).map { case (cell, xs) =>
      cell -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val got = SparkEntry.queries("vec_silhouette")(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet === agg.keySet)
    got.foreach { r =>
      val (n, sum) = agg(r.getLong(0))
      assert(r.getLong(1) === n, s"cell ${r.getLong(0)} count")
      assert(r.getLong(2) === sum / n, s"cell ${r.getLong(0)} mean sil")
    }
    // non-vacuous: geometry separates (not all cells identical)
    assert(got.map(_.getLong(2)).distinct.length > 1)
  }
}

/** Wave-I: CMS one-sided-bias law + outlier sentinel semantics. */
class WaveISpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("CMS never underestimates and exact counts replay from raw events") {
    val exact = Tables.events(spark, dir).select("user_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q_events_cms_heavy")(spark, dir).collect()
    assert(got.length === math.min(10, exact.size))
    // top-10 selection matches the exact ranking
    val wantTop = exact.toSeq.sortBy { case (u, n) => (-n, u) }.take(10)
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === wantTop)
    got.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"user ${r.getLong(0)}: CMS underestimated")
      assert(r.getLong(3) === (r.getLong(2) - r.getLong(1)) * 1000 / r.getLong(1))
    }
    // replay the sketch itself: 4x64 cells from Mix64, min over rows
    val cells = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    exact.foreach { case (u, n) =>
      (0L to 3L).foreach { i =>
        cells((i, (functions.Mix64(u * 4 + i) >>> 32) % 64)) += n
      }
    }
    got.foreach { r =>
      val u = r.getLong(0)
      val est = (0L to 3L).map(i => cells((i, (functions.Mix64(u * 4 + i) >>> 32) % 64))).min
      assert(r.getLong(2) === est, s"user $u sketch estimate")
    }
  }

  test("knn outlier ranks singleton-bucket vectors most isolated") {
    val got = SparkEntry.queries("vec_knn_outlier")(spark, dir).collect()
    assert(got.length === 20)
    // ordering: kth_cos ascending with vec_id tiebreak
    val keys = got.map(r => (r.getLong(2), r.getLong(0)))
    assert(keys.sortBy(identity).toSeq === keys.toSeq)
    // sentinel semantics: any vector with no neighbors carries -2e6 and
    // sorts before every vector that has neighbors
    got.filter(_.getLong(1) == 0L).foreach(r => assert(r.getLong(2) === -2000000L))
    // consistency with the graph key: kth cosine = min neighbor cosine
    val g = SparkEntry.queries("vec_knn_graph")(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(rs =>
        rs.map(r => math.round(r.getDouble(2) * 1000000)).min).toMap
    got.filter(_.getLong(1) > 0L).foreach { r =>
      assert(r.getLong(2) === g(r.getLong(0)), s"vec ${r.getLong(0)} kth cosine")
    }
  }
}

/** Wave-J: MIPS vs cosine ranking divergence + date-dim calendar laws. */
class WaveJSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("MIPS ranks by exact integer dot, replayed fully in driver Scala") {
    val embs = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(x => math.round(x.toDouble * 1000)))
      .toMap
    val got = SparkEntry.queries("ann_mips_topk")(spark, dir).collect()
    got.foreach { r =>
      val want = embs(r.getLong(0)).zip(embs(r.getLong(1))).map { case (a, b) => a * b }.sum
      assert(r.getLong(2) === want, s"dot for (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // full replay of each query's ranking
    (0L to 4L).foreach { q =>
      val want = embs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, embs(q).zip(v).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1)
      val gotIds = got.filter(_.getLong(0) == q).sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      assert(gotIds === want, s"query $q MIPS ranking")
    }
  }

  test("date dim spans the fact range with correct calendar flags") {
    val rows = SparkEntry.queries("q_date_dim")(spark, dir).collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getDate(0).toLocalDate)
    // contiguous daily spine
    days.sliding(2).foreach { case Array(a, b) => assert(b === a.plusDays(1)) }
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getLong(1) === d.getYear.toLong)
      assert(r.getLong(3) === d.getMonthValue.toLong)
      assert(r.getLong(4) === d.getDayOfMonth.toLong)
      assert(r.getLong(5) === d.getDayOfWeek.getValue.toLong) // ISO Mon=1
      assert(r.getBoolean(6) === (d.getDayOfWeek.getValue >= 6))
      assert(r.getBoolean(7) === (d.getDayOfMonth == 1))
      assert(r.getBoolean(8) === (d.getDayOfMonth == d.lengthOfMonth))
    }
  }
}

/** Wave-K: exact KS replay + the streaming CMS twin's cell equality. */
class WaveKSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("q_ks_test replays the exact integer KS statistic in driver Scala") {
    val docs = Tables.documents(spark, dir).select("source", "n_chars").collect()
      .map(r => r.getString(0) -> r.get(1).asInstanceOf[Number].longValue)
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val top2 = bySrc.toSeq.map { case (s, xs) => (s, xs.length.toLong) }
      .sortBy { case (s, n) => (-n, s) }.take(2)
    val (sa, na) = top2(0); val (sb, nb) = top2(1)
    val xa = bySrc(sa).sorted; val xb = bySrc(sb).sorted
    val grid = (xa ++ xb).distinct.sorted
    val dNum = grid.map { v =>
      val ca = xa.count(_ <= v).toLong; val cb = xb.count(_ <= v).toLong
      math.abs(ca * nb - cb * na)
    }.max
    val r = SparkEntry.queries("q_ks_test")(spark, dir).head()
    assert(r.getString(0) === sa && r.getString(1) === sb)
    assert(r.getLong(2) === na && r.getLong(3) === nb)
    assert(r.getLong(4) === dNum)
    assert(r.getLong(5) === na * nb)
    assert(r.getLong(6) === dNum * 1000 / (na * nb))
    // non-vacuous: the two sources genuinely differ somewhere
    assert(dNum > 0)
  }

  test("streamed CMS cells equal the batch sketch and probes match the key") {
    val cells = streaming.CmsStream.cells(spark, dir)
    val streamed = cells.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // batch replay of the same 4x64 sketch
    val exact = Tables.events(spark, dir).select("user_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val want = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    exact.foreach { case (u, n) =>
      (0L to 3L).foreach { i => want((i, (functions.Mix64(u * 4 + i) >>> 32) % 64)) += n }
    }
    assert(streamed === want.toMap)
    // publish-boundary probes reproduce the batch key's estimates
    val keyRows = SparkEntry.queries("q_events_cms_heavy")(spark, dir).collect()
    keyRows.foreach { r =>
      assert(streaming.CmsStream.estimate(cells, r.getLong(0)) === r.getLong(2),
        s"user ${r.getLong(0)} streamed estimate")
    }
  }
}

/** Multi-seed BFS must be pointwise identical to per-seed BFS — the
  * equivalence that justified collapsing reach-dist's 4 loops into 1.
  */
class KhopMultiSpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  test("khopMulti(seeds) equals the union of khop(seed) runs") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey").distinct()
    val e = li.as("x").join(li.as("y"), Seq("l_orderkey"))
      .where(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b")).distinct()
    val bidir = e.unionByName(e.select(col("b").as("a"), col("a").as("b"))).persist()
    val seeds = bidir.groupBy("a").agg(count(lit(1)).as("deg"))
      .orderBy(desc("deg"), col("a")).limit(3).collect().map(_.getLong(0)).toSeq
    val multi = graph.Bfs.khopMulti(bidir, seeds, hops = 3)
    val got = multi.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    multi.unpersist()
    val want = seeds.flatMap { sd =>
      val v = graph.Bfs.khop(bidir, sd, hops = 3)
      val rows = v.collect().map(r => (sd, r.getLong(0)) -> r.getLong(1))
      v.unpersist()
      rows
    }.toMap
    bidir.unpersist()
    assert(got === want)
    // non-vacuous: the seeds genuinely reach beyond themselves
    assert(want.count(_._2 > 0) > seeds.length)
  }
}
