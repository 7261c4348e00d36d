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

/** TPC-H authority replays (r10 verdict task #7): every oracle in the
  * registry is a builder-authored DuckDB mirror, so the TPC-H keys'
  * one residual correctness risk is same-author-both-sides. These
  * replays break the loop with a THIRD computation path that shares
  * nothing with either side: raw parquet rows collected and folded in
  * plain Scala (HashMap + arithmetic — no Spark aggregation, no SQL),
  * asserted equal to five TPC-H-shaped keys' outputs at sf0.001.
  */
class TpchReplaySpec extends AnyFunSuite {
  import TestSpark._
  private val dir = "/root/testdata/sf0.001"

  // Spark's round(x, 0) on DoubleType: BigDecimal.valueOf (canonical
  // Double.toString rep) + HALF_UP — replicated literally
  private def rnd(x: Double): Long =
    java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue
  private def cents(x: Double): Long = rnd(x * 100)

  private def ldt(v: Any): java.time.LocalDateTime = v match {
    case t: java.sql.Timestamp => t.toLocalDateTime
    case d: java.time.LocalDateTime => d
    case other => sys.error(s"unexpected temporal value: $other")
  }
  private def lv(v: Any): Long = v.asInstanceOf[Number].longValue
  private def dv(v: Any): Double = v.asInstanceOf[Number].doubleValue
  private def t(s: String) = java.time.LocalDateTime.parse(s + "T00:00:00")

  private lazy val li = Tables.lineitem(spark, dir).select(
    "l_orderkey", "l_partkey", "l_returnflag", "l_linestatus", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_shipdate").collect()

  test("Q1 shape (q1_agg) replays from raw rows") {
    val cut = t("1998-09-02")
    val acc = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long, Long, Long, Long)]
    li.foreach { r =>
      if (!ldt(r.get(8)).isAfter(cut)) {
        val k = (r.getString(2), r.getString(3))
        val (ep, di, tx) = (dv(r.get(5)), dv(r.get(6)), dv(r.get(7)))
        val prev = acc.getOrElse(k, (0L, 0L, 0L, 0L, 0L))
        acc(k) = (prev._1 + lv(r.get(4)), prev._2 + cents(ep),
          prev._3 + rnd(ep * (1.0 - di) * 100),
          prev._4 + rnd(ep * (1.0 - di) * (1.0 + tx) * 100), prev._5 + 1)
      }
    }
    val out = SparkEntry.queries("q1_agg")(spark, dir).collect()
    assert(out.length === acc.size && out.nonEmpty)
    out.foreach { r =>
      val (qty, base, disc, charge, n) = acc((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === qty && r.getLong(3) === base)
      assert(r.getLong(4) === disc && r.getLong(5) === charge)
      assert(math.abs(r.getDouble(6) - qty.toDouble / n) < 1e-9)
      assert(r.getLong(7) === n)
    }
  }

  test("Q6 shape (q_forecast_revenue) replays from raw rows") {
    var rev = 0L; var n = 0L
    li.foreach { r =>
      val sd = ldt(r.get(8))
      val dc = cents(dv(r.get(6)))
      if (!sd.isBefore(t("1996-01-01")) && sd.isBefore(t("1997-01-01")) &&
        dc >= 5 && dc <= 7 && dv(r.get(4)) < 24) {
        rev += cents(dv(r.get(5))) * dc; n += 1
      }
    }
    val out = SparkEntry.queries("q_forecast_revenue")(spark, dir).head()
    assert(n > 0)
    assert(out.getLong(0) === rev && out.getLong(1) === n)
  }

  test("Q3 shape (q_shipping_priority) replays from raw rows") {
    val cut = t("1997-06-01")
    val building = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
      .collect().filter(_.getString(1) == "BUILDING").map(r => lv(r.get(0))).toSet
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority").collect()
      .filter(r => ldt(r.get(2)).isBefore(cut) && building(lv(r.get(1))))
      .map(r => lv(r.get(0)) -> ((ldt(r.get(2)).toLocalDate.toString, r.getString(3))))
      .toMap
    val acc = scala.collection.mutable.Map.empty[(Long, String, String), Long]
    li.foreach { r =>
      if (ldt(r.get(8)).isAfter(cut)) {
        ord.get(lv(r.get(0))).foreach { case (d, pri) =>
          val k = (lv(r.get(0)), d, pri)
          acc(k) = acc.getOrElse(k, 0L) +
            cents(dv(r.get(5))) * (100L - cents(dv(r.get(6))))
        }
      }
    }
    val expect = acc.toSeq.sortBy { case ((ok, _, _), rev) => (-rev, ok) }.take(10)
    val out = SparkEntry.queries("q_shipping_priority")(spark, dir).collect()
    assert(out.length === expect.length && out.nonEmpty)
    out.zip(expect).foreach { case (r, ((ok, d, pri), rev)) =>
      assert(lv(r.get(0)) === ok && r.getString(1) === d)
      assert(r.getString(2) === pri && r.getLong(3) === rev)
    }
  }

  test("Q12 shape (q_priority_class) replays from raw rows") {
    val pri = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
      .collect().map(r => lv(r.get(0)) -> r.getString(1)).toMap
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    li.foreach { r =>
      val sd = ldt(r.get(8))
      if (!sd.isBefore(t("1996-01-01")) && sd.isBefore(t("1997-01-01"))) {
        val high = Set("1-URGENT", "2-HIGH")(pri(lv(r.get(0))))
        val prev = acc.getOrElse(r.getString(3), (0L, 0L))
        acc(r.getString(3)) =
          (prev._1 + (if (high) 1L else 0L), prev._2 + (if (high) 0L else 1L))
      }
    }
    val out = SparkEntry.queries("q_priority_class")(spark, dir).collect()
    assert(out.length === acc.size && out.nonEmpty)
    out.foreach { r =>
      val (h, l) = acc(r.getString(0))
      assert(r.getLong(1) === h && r.getLong(2) === l)
    }
  }

  test("Q14 shape (q_promo_share) replays from raw rows") {
    val ptype = Tables.part(spark, dir).select("p_partkey", "p_type")
      .collect().map(r => lv(r.get(0)) -> r.getString(1)).toMap
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    li.foreach { r =>
      ptype.get(lv(r.get(1))).foreach { pt =>
        val d = ldt(r.get(8)).toLocalDate
        val mon = f"${d.getYear}%04d-${d.getMonthValue}%02d"
        val rev = cents(dv(r.get(5))) * (100L - cents(dv(r.get(6))))
        val prev = acc.getOrElse(mon, (0L, 0L))
        acc(mon) = (prev._1 + (if (pt == "PROMO") rev else 0L), prev._2 + rev)
      }
    }
    val out = SparkEntry.queries("q_promo_share")(spark, dir).collect()
    assert(out.length === acc.size && out.nonEmpty)
    out.foreach { r =>
      val (promo, total) = acc(r.getString(0))
      assert(r.getLong(1) === promo && r.getLong(2) === total)
      assert(r.getLong(3) === promo * 1000 / total)
    }
  }
}

class HitsSpec extends AnyFunSuite {
  import TestSpark._

  test("a planted star separates pure hubs from pure authorities") {
    import spark.implicits._
    // 0 points at 1,2,3 — 0 is the only hub, 1-3 the only authorities
    val edges = Seq((0L, 1L, 5L), (0L, 2L, 5L), (0L, 3L, 5L)).toDF("src", "dst", "cnt")
    val out = graph.Hits.run(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L)._1 === 1000000000000L && out(0L)._2 === 0L)
    Seq(1L, 2L, 3L).foreach { v =>
      assert(out(v)._1 === 0L)
      assert(math.abs(out(v)._2 - 1000000000000L / 3) <= 1)
    }
  }

  test("q_graph_hits scores are L1-normalized within truncation slack and reproducible") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_graph_hits")(spark, dir).collect()
    assert(out.nonEmpty)
    val scale = 1000000000000L
    val hubSum = out.map(_.getLong(2)).sum
    val authSum = out.map(_.getLong(3)).sum
    // truncating divides lose at most 1 unit per node per normalize
    assert(hubSum <= scale && hubSum >= scale - out.length)
    assert(authSum <= scale && authSum >= scale - out.length)
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(3) >= 0))
    val again = SparkEntry.queries("q_graph_hits")(spark, dir).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}

class KendallReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("tau-b terms replay from a brute-force pair scan of raw rows") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(spark, dir).select("l_quantity", "l_discount").collect()
      .map { r =>
        val q = r.get(0).asInstanceOf[Number].longValue
        val d = java.math.BigDecimal.valueOf(r.get(1).asInstanceOf[Number].doubleValue * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
        (q, d)
      }
    var c = 0L; var dsc = 0L; var tx = 0L; var ty = 0L
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length) {
        val (xa, ya) = rows(i); val (xb, yb) = rows(j)
        if (xa == xb) { tx += 1; if (ya == yb) ty += 1 }
        else if (ya == yb) ty += 1
        else if ((xa < xb) == (ya < yb)) c += 1
        else dsc += 1
        j += 1
      }
      i += 1
    }
    val out = SparkEntry.queries("q_corr_kendall")(spark, dir).head()
    assert(out.getLong(0) === rows.length.toLong)
    assert(out.getLong(1) === rows.length.toLong * (rows.length - 1) / 2)
    assert(out.getLong(2) === c && out.getLong(3) === dsc)
    assert(out.getLong(4) === tx && out.getLong(5) === ty)
    assert(out.getLong(6) === c - dsc)
  }
}

class HoltReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("the level/trend recursion replays in driver Scala from monthly sums") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_orders_holt")(spark, dir).collect()
    assert(out.length > 2)
    val rs = out.map(_.getLong(1))
    var l = rs(0); var b = 0L
    out.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) {
        val nl = (rs(i) + l + b) / 2
        b = (nl - l + b) / 2
        l = nl
      }
      assert(r.getLong(2) === l, s"level mismatch at ${r.getString(0)}")
      assert(r.getLong(3) === b, s"trend mismatch at ${r.getString(0)}")
      assert(r.getLong(4) === l + b)
    }
  }
}

class SimhashSweepSpec extends AnyFunSuite {
  import TestSpark._

  test("the <=3 point equals dedup_simhash and pair counts are monotone in the threshold") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_simhash_sweep")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L))
    val sh = SparkEntry.queries("dedup_simhash")(spark, dir).count()
    assert(out(3L)._1 === sh)
    assert(out(0L)._1 <= out(1L)._1 && out(1L)._1 <= out(2L)._1 && out(2L)._1 <= out(3L)._1)
    out.values.foreach { case (n, tp) => assert(tp <= n) }
  }
}

class PqDeltaSpec extends AnyFunSuite {
  import TestSpark._

  test("base and delta partition the corpus per subspace; drift is finite and reproducible") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ann_pq_delta")(spark, dir).collect()
    assert(out.length === 8)
    val n = Tables.embeddings(spark, dir).count()
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === n, s"subspace ${r.getLong(0)} must cover the corpus")
      assert(r.getLong(2) > 0, "the delta split must be non-empty")
      assert(r.getLong(5) >= 0)
    }
    val again = SparkEntry.queries("ann_pq_delta")(spark, dir).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}

class SpearmanReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("rank2 factors replay from a driver-Scala ranking of the daily series") {
    val dir = "/root/testdata/sf0.001"
    val daily = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // doubled average rank: 2*(#smaller) + (#equal) + 1, computed by scan
    def rank2(vs: Array[Long]): Map[Long, Long] =
      vs.distinct.map { v =>
        v -> (2L * vs.count(_ < v) + vs.count(_ == v) + 1L)
      }.toMap
    val rx = rank2(daily.map(_._1)); val ry = rank2(daily.map(_._2))
    val n = daily.length.toLong
    val sxy = daily.map { case (x, y) => rx(x) * ry(y) }.sum
    val sxx = daily.map { case (x, _) => rx(x) * rx(x) }.sum
    val syy = daily.map { case (_, y) => ry(y) * ry(y) }.sum
    val out = SparkEntry.queries("q_spearman_daily")(spark, dir).head()
    assert(out.getLong(0) === n)
    assert(out.getLong(1) === sxy && out.getLong(2) === sxx && out.getLong(3) === syy)
    assert(out.getLong(4) === n * sxy - n * (n + 1) * (n * (n + 1)))
    assert(out.getLong(5) === n * sxx - n * (n + 1) * (n * (n + 1)))
    assert(out.getLong(6) === n * syy - n * (n + 1) * (n * (n + 1)))
    // tie-aware identity: doubled ranks must sum to n(n+1) exactly
    assert(daily.map { case (x, _) => rx(x) }.sum === n * (n + 1))
  }
}

class MannWhitneyReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("U replays from a brute-force pair count over raw quantities") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(spark, dir)
      .where(col("l_returnflag").isin("R", "N"))
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rs = rows.filter(_._1 == "R").map(_._2)
    val ns = rows.filter(_._1 == "N").map(_._2)
    // doubled U_R = 2*#(r>n) + #(r==n) over all cross pairs
    var u2 = 0L
    rs.foreach { r => ns.foreach { n =>
      if (r > n) u2 += 2 else if (r == n) u2 += 1 } }
    val out = SparkEntry.queries("q_mannwhitney_u")(spark, dir).head()
    assert(out.getLong(0) === rs.length.toLong && out.getLong(1) === ns.length.toLong)
    assert(out.getLong(2) === u2)
    // partition identity: U_R + U_N = n_R * n_N (doubled on both sides)
    assert(out.getLong(2) + out.getLong(3) === 2L * rs.length * ns.length)
    val tie = rows.map(_._2).groupBy(identity).values
      .map(g => g.length.toLong * g.length * g.length - g.length).sum
    assert(out.getLong(4) === tie)
  }
}

class RunsTestReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("runs/median replay from a driver-Scala fold of the monthly series") {
    val dir = "/root/testdata/sf0.001"
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev"))
      .orderBy("m").collect().map(_.getLong(1))
    val srt = monthly.sorted
    val med2 = srt((monthly.length + 1) / 2 - 1) + srt(monthly.length / 2)
    val signs = monthly.map(r => java.lang.Long.signum(r * 2 - med2)).filter(_ != 0)
    val runs = if (signs.isEmpty) 0
      else 1 + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val out = SparkEntry.queries("q_orders_runs_test")(spark, dir).head()
    assert(out.getLong(0) === monthly.length.toLong)
    assert(out.getLong(1) === signs.count(_ > 0).toLong)
    assert(out.getLong(2) === signs.count(_ < 0).toLong)
    assert(out.getLong(3) === runs.toLong)
    val (np, nm) = (signs.count(_ > 0).toLong, signs.count(_ < 0).toLong)
    assert(out.getLong(4) === 1000L + 2000L * np * nm / math.max(np + nm, 1L))
  }
}

class CramersVSpec extends AnyFunSuite {
  import TestSpark._

  test("V^2 is the chi2 key's statistic normalized into [0, 1e6] ppm") {
    val dir = "/root/testdata/sf0.001"
    val v = SparkEntry.queries("q_cramers_v")(spark, dir).head()
    val chi = SparkEntry.queries("q_brand_type_chi2")(spark, dir).head()
    assert(v.getLong(3) === chi.getLong(1), "chi2_m must match the chi2 key exactly")
    assert(v.getLong(4) >= 0 && v.getLong(4) <= 1000000L)
    val n = Tables.part(spark, dir).count()
    assert(v.getLong(0) === n)
    assert(v.getLong(4) === v.getLong(3) * 1000 / (n * (math.min(v.getLong(1), v.getLong(2)) - 1)))
  }
}

class JsdReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("jsd_nano replays exactly from collected (source, word) counts") {
    val dir = "/root/testdata/sf0.001"
    def qln(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    val qln2 = 693147180L
    val sw = Tables.documents(spark, dir)
      .select(col("source"), explode(text.Text.words(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nS = sw.groupBy(_._1).map { case (s0, g) => s0 -> g.map(_._3).sum }
    val cW = sw.groupBy(_._2).map { case (w, g) => w -> g.map(_._3).sum }
    val nC = sw.map(_._3).sum
    val expected = sw.groupBy(_._1).map { case (src, g) =>
      val ns = nS(src)
      var psum = 0L; var qsum = 0L; var ws = 0L
      g.foreach { case (_, w, csw) =>
        val cw = cW(w)
        val mix = qln(csw * nC + cw * ns)
        psum += csw * (qln2 + qln(csw) + qln(nC) - mix)
        qsum += cw * (qln2 + qln(cw) + qln(ns) - mix)
        ws += cw
      }
      // Spark's `div` truncates toward zero — mirror it exactly (all
      // three numerators are provably >= 0 here: both JSD halves are
      // KL(.||m) >= 0 and quantization noise stays far below the signal)
      val pn = psum / ns
      val qn = (qsum + (nC - ws) * qln2) / nC
      src -> (ns, pn, qn, (pn + qn) / 2L)
    }
    val out = SparkEntry.queries("text_source_jsd")(spark, dir).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val (ns, pn, qn, jn) = expected(r.getString(0))
      assert(r.getLong(1) === ns && r.getLong(2) === pn)
      assert(r.getLong(3) === qn && r.getLong(4) === jn)
      // JSD is bounded by ln 2; quantization keeps it within a few nano
      assert(jn >= -5L && jn <= qln2 + 5L)
    }
  }
}

class RollingMedianReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("the 7-day range-frame median replays from a driver-Scala window scan") {
    val dir = "/root/testdata/sf0.001"
    val dayNs = 86400L * 1000000000L
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(s"ts_ns div $dayNs").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val expected = daily.map { case (t, d, _) =>
      val win = byType(t).filter(x => x._2 >= d - 6 && x._2 <= d)
        .map(_._3 * 2).sorted
      val med2 = if (win.length % 2 == 1) win(win.length / 2)
        else (win(win.length / 2 - 1) + win(win.length / 2)) / 2
      (t, d) -> med2
    }.toMap
    val out = SparkEntry.queries("q_events_rolling_median")(spark, dir).collect()
    assert(out.length === daily.length)
    out.foreach { r =>
      assert(r.getLong(3) === expected((r.getString(0), r.getLong(1))),
        s"(${r.getString(0)}, day ${r.getLong(1)})")
    }
  }
}

class WeightedMedianReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("the weighted median replays from a driver-Scala cumulative-weight scan") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (f, g) =>
      val grid = g.groupBy(_._2).map { case (v, vs) => (v, vs.map(_._3).sum) }
        .toArray.sortBy(_._1)
      val tw = grid.map(_._2).sum
      var cw = 0L
      val wmed = grid.collectFirst {
        case (v, w) if { cw += w; cw * 2 >= tw } => v
      }.get
      f -> (wmed, tw, grid.length.toLong)
    }
    val out = SparkEntry.queries("q_weighted_median")(spark, dir).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val (wm, tw, nv) = expected(r.getString(0))
      assert(r.getLong(1) === wm && r.getLong(2) === tw && r.getLong(3) === nv)
    }
  }
}

class EmbedEvalSpec extends AnyFunSuite {
  import TestSpark._

  test("candidates verify exactly, so fp = 0 and precision is 1000 whenever pairs exist") {
    val dir = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("dedup_embed_eval")(spark, dir).head()
    val (nPred, nTruth, tp, fp, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(fp === 0L, "blocked candidates are a SUBSET of the exact truth")
    assert(tp === nPred && tp + fn === nTruth)
    assert(nTruth > 0, "the eval slice must produce a non-degenerate truth set")
    if (nPred > 0) assert(r.getLong(5) === 1000L)
    assert(r.getLong(6) === tp * 1000 / math.max(nTruth, 1))
  }
}

class SqRecallSpec extends AnyFunSuite {
  import TestSpark._

  test("SQ8 reconstruction stays inside the per-dimension fit range and recall is sane") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("vec_sq_recall")(spark, dir).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getLong(1) === 10L)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000L)
      assert(r.getLong(3) === r.getLong(2) * 1000 / r.getLong(1))
    }
    // mechanism check: reconstructed values never leave [mn, mn+rg]
    val emb = Tables.embeddings(spark, dir)
    val topk = ann.Ann.sqTopK(emb, Seq(0L, 1L), 5)
    assert(topk.count() === 10)
    // determinism: two invocations rank identically
    val again = ann.Ann.sqTopK(emb, Seq(0L, 1L), 5)
    assert(topk.collect().map(_.toString).sorted.toSeq ===
      again.collect().map(_.toString).sorted.toSeq)
  }
}

class SystematicSpec extends AnyFunSuite {
  import TestSpark._

  test("every-20th spacing holds exactly and the draw replays from a driver-Scala sort") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("samp_systematic")(spark, dir).collect()
    val rns = out.map(_.getLong(2))
    assert(rns.head === 7L)
    assert(rns.sliding(2).forall(p => p.length < 2 || p(1) - p(0) === 20L),
      "selected ranks must be exactly 20 apart")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s0: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s0.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val ordered = docs.sortBy { case (id, _) => (md5hex(id.toString), id) }
    val expected = ordered.zipWithIndex.map { case ((id, l), i) => (id, l, i + 1L) }
      .filter(_._3 % 20 === 7L)
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (r, (id, l, rn)) =>
      assert(r.getLong(0) === id && r.getString(1) === l && r.getLong(2) === rn)
    }
  }
}

class ClosenessSpec extends AnyFunSuite {
  import TestSpark._

  test("closeness/harmonic are exact folds of the reach distribution") {
    val dir = "/root/testdata/sf0.001"
    val reach = SparkEntry.queries("q_graph_reach_dist")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = SparkEntry.queries("q_graph_closeness")(spark, dir).collect()
    assert(out.length === reach.map(_._1).distinct.length)
    out.foreach { r =>
      val seed = r.getLong(0)
      val hops = reach.filter(x => x._1 == seed && x._2 > 0)
      val nReached = hops.map(_._3).sum
      val sumDist = hops.map(x => x._2 * x._3).sum
      val harm = hops.map(x => (1000L / x._2) * x._3).sum
      assert(r.getLong(1) === nReached && r.getLong(2) === sumDist)
      assert(r.getLong(3) === harm)
      assert(r.getLong(4) === nReached * 1000 / sumDist)
    }
  }
}

class TriplesReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("top-20 3-itemsets replay from driver-Scala combination counting") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val counts = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ps = g.map(_._2).sorted
      ps.combinations(3).foreach { c =>
        val k = (c(0), c(1), c(2)); counts(k) = counts.getOrElse(k, 0L) + 1
      }
    }
    val expected = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    val out = SparkEntry.queries("q_copurchase_triples")(spark, dir).collect()
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (r, ((a, b, c), n)) =>
      assert(r.getLong(0) === a && r.getLong(1) === b && r.getLong(2) === c)
      assert(r.getLong(3) === n)
    }
  }
}

class HoltWintersReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("the level/trend/season recursion replays in driver Scala from daily counts") {
    val dir = "/root/testdata/sf0.001"
    val dayNs = 86400L * 1000000000L
    val daily = Tables.events(spark, dir)
      .groupBy(expr(s"ts_ns div $dayNs").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(daily.length >= 8, "the events table must span more than a week")
    val xs = daily.map(_._2)
    var l = xs.take(7).sum / 7
    var b = 0L
    val sq = scala.collection.mutable.Queue(xs.take(7).map(_ - l): _*)
    val expected = (7 until xs.length).map { t =>
      val x = xs(t); val s1 = sq.dequeue()
      val fitted = l + b + s1
      val nl = (x - s1 + l + b) / 2
      val nb = (nl - l + b) / 2
      val ns = (x - nl + s1) / 2
      l = nl; b = nb; sq.enqueue(ns)
      (daily(t)._1, x, fitted, nl, nb, ns)
    }
    val out = SparkEntry.queries("q_events_holt_winters")(spark, dir).collect()
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (r, (d, x, f, nl, nb, ns)) =>
      assert(r.getLong(0) === d && r.getLong(1) === x)
      assert(r.getLong(2) === f, s"fitted at day $d")
      assert(r.getLong(3) === nl && r.getLong(4) === nb && r.getLong(5) === ns)
    }
  }
}

class BloomFprSpec extends AnyFunSuite {
  import TestSpark._

  test("members never miss (no false negatives) and the published FPR is the exact ratio") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_bloom_fpr_eval")(spark, dir).head()
    val (nMembers, nBits, nProbes, nFp) =
      (out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
    assert(nBits > 0 && nBits <= 4096L)
    assert(nFp >= 0 && nFp <= nProbes)
    assert(out.getLong(4) === nFp * 1000 / math.max(nProbes, 1L))
    assert(out.getLong(5) === nBits * nBits * nBits * nBits * 1000L /
      (4096L * 4096L * 4096L * 4096L))
    // no-false-negative law, replayed in driver Scala with the same Mix64:
    // every member key's 4 bits must be in the occupied set
    val members = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long")).distinct().collect().map(_.getLong(0))
    assert(members.length.toLong === nMembers)
    val occupied = members.flatMap(k => (0L to 3L).map(i =>
      (functions.Mix64(k * 4 + i) >>> 32) % 4096L)).toSet
    assert(occupied.size.toLong === nBits)
    members.take(100).foreach { k =>
      (0L to 3L).foreach { i =>
        assert(occupied.contains((functions.Mix64(k * 4 + i) >>> 32) % 4096L))
      }
    }
  }
}

class ContrastStretchSpec extends AnyFunSuite {
  import TestSpark._

  test("stretch replays from the planted pixel formula and hits the full [0,255] range") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("mm_contrast_stretch")(spark, dir).collect()
    assert(out.nonEmpty)
    out.take(50).foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val px = for (y <- 0 until h; x <- 0 until w)
        yield mm.Multimodal.pixelValue(id, 0, x, y).toLong
      val (mn, mx) = (px.min, px.max)
      val rg = math.max(mx - mn, 1L)
      assert(r.getLong(3) === mn && r.getLong(4) === mx)
      val ssum = px.map(v => (v - mn) * 255L / rg).sum
      assert(r.getLong(5) === ssum)
      assert(r.getLong(6) === ssum * 1000 / (w * h))
      // a stretched raster must touch both ends of the range
      assert(px.map(v => (v - mn) * 255L / rg).min === 0L)
      if (mx > mn) assert(px.map(v => (v - mn) * 255L / rg).max === 255L)
    }
  }
}

class SaltSweepSpec extends AnyFunSuite {
  import TestSpark._

  test("more salt never worsens the straggler share, and f=1 is the raw key skew") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_join_skew_salt_sweep")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSeq === Seq(1L, 4L, 16L))
    val total = out.head._4
    assert(out.forall(_._4 === total), "every factor sees the same fact rows")
    // f=1: buckets = distinct keys, max_load = the hottest key's rows
    val perKey = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(out.head._2 === perKey.length.toLong)
    assert(out.head._3 === perKey.max)
    // salting monotonically flattens (max_load non-increasing in f)
    assert(out(0)._3 >= out(1)._3 && out(1)._3 >= out(2)._3)
    // replay f=4 exactly with the same Mix64 salt
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").cast("long"), col("l_orderkey").cast("long"),
        col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val loads = rows.groupBy { case (k, o, l) =>
      (k, (functions.Mix64(o * 8 + l) >>> 32) % 4) }.map(_._2.length.toLong)
    assert(out(1)._2 === loads.size.toLong && out(1)._3 === loads.max)
  }
}

class BloomStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streamed bits equal the batch bit set; present keys never miss") {
    val dir = "/root/testdata/sf0.001"
    val streamed = streaming.BloomStream.occupiedBits(spark, dir)
    val batch = streaming.BloomStream.batchBits(spark, dir)
    val sm = streamed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bm = batch.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sm === bm, "complete-mode stream state must equal the batch sketch")
    assert(sm.size <= 4096, "state is bounded at m rows by construction")
    // no-false-negative law at the publish boundary: one snapshot
    // collect serves the whole probe batch
    val snap = streaming.BloomStream.snapshotBits(streamed)
    val users = Tables.events(spark, dir).select(col("user_id").cast("long"))
      .distinct().limit(25).collect().map(_.getLong(0))
    users.foreach { u =>
      assert(streaming.BloomStream.mightContain(snap, u), s"user $u must be present")
    }
    // the DataFrame overload stays a thin wrapper over the same math
    assert(streaming.BloomStream.mightContain(streamed, users.head))
  }
}

class MutualInfoSpec extends AnyFunSuite {
  import TestSpark._

  test("MI is non-negative, bounded by both marginal entropies, and replays from counts") {
    val dir = "/root/testdata/sf0.001"
    def qln(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    val r = SparkEntry.queries("q_brand_type_mi")(spark, dir).head()
    val (n, mi, hx, hy) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
    // quantization can push the folds a few nano around zero, never more
    assert(mi >= -5L && mi <= math.min(hx, hy) + 5L)
    assert(hx > 0 && hy > 0)
    val cells = Tables.part(spark, dir).groupBy("p_brand", "p_type")
      .agg(count(lit(1)).as("c")).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val rt = cells.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).sum }
    val ct = cells.groupBy(_._2).map { case (k, g) => k -> g.map(_._3).sum }
    val miSum = cells.map { case (b, t, c) =>
      c * (qln(c) + qln(n) - qln(rt(b)) - qln(ct(t))) }.sum
    assert(mi === miSum / n)
    assert(r.getLong(1) === cells.length.toLong)
    assert(hx === rt.values.map(v => v * (qln(n) - qln(v))).sum / n)
  }
}

class HillAlphaSpec extends AnyFunSuite {
  import TestSpark._

  test("the tail exponent replays from per-user counts and sits above 1") {
    val dir = "/root/testdata/sf0.001"
    def qln(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    val counts = Tables.events(spark, dir).groupBy("user_id")
      .agg(count(lit(1)).as("x")).collect().map(_.getLong(1))
    val tail = counts.filter(_ >= 5L)
    val denom = tail.map(x => qln(x) - qln(5L)).sum
    val r = SparkEntry.queries("q_users_hill_alpha")(spark, dir).head()
    assert(r.getLong(0) === 5L && r.getLong(1) === counts.length.toLong)
    assert(r.getLong(2) === tail.length.toLong && r.getLong(3) === denom)
    assert(r.getLong(4) === 1000L + tail.length * 1000000000000L / math.max(denom, 1L))
    assert(r.getLong(4) > 1000L, "a Hill alpha at or below 1 is not a valid tail")
  }
}

class CupedSpec extends AnyFunSuite {
  import TestSpark._

  test("arms partition users, theta is the pooled regression slope, adjustment preserves the pooled mean direction") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_events_cuped")(spark, dir).collect()
    assert(out.length === 2)
    assert(out.map(_.getLong(0)).toSet === Set(0L, 1L))
    val nUsers = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum === nUsers)
    // theta identical on both rows (pooled), and the adjusted means stay
    // finite and near the raw means (the covariate shift is bounded)
    assert(out.map(_.getLong(4)).distinct.length === 1)
    out.foreach { r =>
      assert(math.abs(r.getLong(6) - r.getLong(5)) <=
        math.abs(r.getLong(4)) * (math.abs(r.getLong(2)) / math.max(r.getLong(1), 1L) + 1000),
        "adjustment must be a bounded covariate correction")
    }
  }
}

class KmeansElbowSpec extends AnyFunSuite {
  import TestSpark._

  test("inertia decreases in k and each leg replays from a fresh deterministic fit") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("vec_kmeans_elbow")(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(4L, 16L, 64L))
    val n = out.head.getLong(1)
    assert(out.forall(_.getLong(1) === n), "every leg scans the same corpus")
    val in = out.map(_.getLong(2))
    assert(in(0) > in(1) && in(1) > in(2),
      "a larger codebook must reduce spherical inertia on this corpus")
    out.foreach(r => assert(r.getLong(3) === r.getLong(2) / r.getLong(1)))
    // deterministic fits: re-running a leg reproduces the same integer
    val emb = Tables.embeddings(spark, dir)
    val cents = ann.KMeans.fit(emb, 4, iters = 1)
    val best = array_max(ann.Ann.cellScores(col("embedding"), cents.toSeq.map(_.toSeq)))
    val again = emb.agg(
      sum(floor((lit(1.0) - best) * 1e6).cast("long"))).head().getLong(0)
    assert(again === in(0))
  }
}

class MergeOnReadSpec extends AnyFunSuite {
  import TestSpark._

  test("the MoR read equals the logical post-delete state and tombstones are counted") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("snk_merge_on_read")(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).map { case (src, g) =>
      val live = g.filter(_._1 % 7 != 3)
      src -> (live.length.toLong, g.count(_._1 % 7 == 3).toLong, live.map(_._3).sum)
    }.filter(_._2._1 > 0)
    assert(out.length === expected.size)
    out.foreach { r =>
      val (live, dead, chars) = expected(r.getString(0))
      assert(r.getLong(1) === live && r.getLong(2) === dead && r.getLong(3) === chars)
    }
    // the deletion vector really is tiny relative to the base
    assert(docs.count(_._1 % 7 == 3) < docs.length / 2)
  }
}

class AllocationEvalSpec extends AnyFunSuite {
  import TestSpark._

  test("both allocations spend the budget exactly and Neyman never loses to proportional") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("samp_allocation_eval")(spark, dir).collect()
    val (tot, per) = rows.partition(_.getString(0) == "TOTAL")
    assert(tot.length === 1)
    assert(per.map(_.getLong(3)).sum === 1000L, "proportional must spend the budget")
    assert(per.map(_.getLong(4)).sum === 1000L, "Neyman must spend the budget")
    assert(tot.head.getLong(3) === 1000L && tot.head.getLong(4) === 1000L)
    // Neyman is the variance-minimizing allocation (Neyman 1934) — its
    // total design variance can't exceed proportional's beyond the
    // integer-rounding slack of the largest-remainder step
    val (vp, vn) = (tot.head.getLong(5), tot.head.getLong(6))
    assert(vn <= vp + vp / 20, s"Neyman total variance $vn must not lose to proportional $vp")
    // per-stratum terms replay: n_h^2 * var_q / alloc
    per.foreach { r =>
      assert(r.getLong(5) === r.getLong(1) * r.getLong(1) * r.getLong(2) / math.max(r.getLong(3), 1L))
      assert(r.getLong(6) === r.getLong(1) * r.getLong(1) * r.getLong(2) / math.max(r.getLong(4), 1L))
    }
  }
}

class ConductanceSpec extends AnyFunSuite {
  import TestSpark._

  test("volume identity holds and conductance is a [0,1000] cut share") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_graph_conductance")(spark, dir).collect()
    assert(out.nonEmpty)
    val mod = SparkEntry.queries("q_graph_modularity")(spark, dir).head()
    assert(out.length.toLong === mod.getLong(1),
      "conductance must cover exactly the modularity key's communities")
    out.foreach { r =>
      val (eIn, cut, dC, cond) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // vol(C) counts each internal edge twice and each crossing edge once
      assert(dC === 2 * eIn + cut, s"volume identity failed for lbl ${r.getLong(0)}")
      assert(cond >= 0 && cond <= 1000)
      assert(cond === cut * 1000 / math.max(math.min(dC, 2 * mod.getLong(0) - dC), 1L))
    }
  }
}

class ForecastReconcileSpec extends AnyFunSuite {
  import TestSpark._

  test("allocations sum to the Holt-Winters total forecast exactly (coherence)") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_events_forecast_reconcile")(spark, dir).collect()
    assert(out.nonEmpty)
    val f = out.head.getLong(2)
    assert(out.forall(_.getLong(2) === f))
    assert(out.map(_.getLong(3)).sum === f, "reconciled forecasts must be coherent")
    // the total really is the HW one-step-ahead: level+trend at the last
    // day plus the season the next day re-uses
    val hw = SparkEntry.queries("q_events_holt_winters")(spark, dir).collect()
    val last = hw.last
    val sAhead = hw.find(_.getLong(0) == last.getLong(0) - 6).get.getLong(5)
    assert(f === math.max(last.getLong(3) + last.getLong(4) + sAhead, 0L))
    // larger share, larger (or equal) allocation
    val sorted = out.sortBy(_.getLong(1))
    assert(sorted.map(_.getLong(3)).sliding(2).forall(p => p.length < 2 || p(0) <= p(1) + 1))
  }
}

class XyzSpec extends AnyFunSuite {
  import TestSpark._

  test("cv2 replays from monthly moments and the class thresholds are honored") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_parts_xyz")(spark, dir).collect()
    assert(out.nonEmpty)
    out.take(200).foreach { r =>
      val (n, s2, cv2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cv2 >= 0)
      val cls = if (cv2 < 250) "X" else if (cv2 < 1000) "Y" else "Z"
      assert(r.getString(4) === cls)
      if (n === 1L) assert(cv2 === 0L, "a single-month part has zero variability")
      assert(s2 > 0)
    }
    // all three classes exist on this corpus (the thresholds are not degenerate)
    assert(out.map(_.getString(4)).distinct.length >= 2)
  }
}

class AbcXyzSpec extends AnyFunSuite {
  import TestSpark._

  test("the matrix covers every part once and the A band holds at most the 80% mass prefix") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_parts_abc_xyz")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 9)
    val nParts = Tables.lineitem(spark, dir).select("l_partkey").distinct().count()
    assert(out.map(_.getLong(2)).sum === nParts, "every part lands in exactly one cell")
    val totRev = out.map(_.getLong(3)).sum
    val aRev = out.filter(_.getString(0) == "A").map(_.getLong(3)).sum
    // A is the <=80% cumulative prefix, so its mass can't exceed 80% by
    // more than one part's revenue; on a sane corpus it lands near 80%
    assert(aRev <= totRev, "A mass is a prefix of the total")
    assert(aRev * 100 >= totRev * 50, "the A band must carry the dominant mass")
    assert(out.map(r => (r.getString(0), r.getString(1))).distinct.length === out.length)
  }
}

class ForecastEvalSpec extends AnyFunSuite {
  import TestSpark._

  test("all models score the same days and HW error replays from its own fitted values") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_forecast_eval")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === Set("holt_winters", "naive_lag1", "naive_lag7"))
    val days = out.values.map(_._1).toSet
    assert(days.size === 1, "every model must score the same day set")
    assert(out.values.map(_._2).toSet.size === 1, "same volume, comparable err_pml")
    val hw = SparkEntry.queries("q_events_holt_winters")(spark, dir).collect()
    val hwErr = hw.map(r => math.abs(r.getLong(1) - r.getLong(2))).sum
    assert(out("holt_winters")._3 === hwErr)
    out.values.foreach { case (_, vol, err, pml) =>
      assert(pml === err * 1000 / math.max(vol, 1L))
    }
  }
}
