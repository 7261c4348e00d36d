package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** xxHash64 written directly from the public reference specification
  * (Yann Collet's XXH64: 4-lane 32-byte stripes, 8/4/1-byte tail steps,
  * avalanche finalizer) — deliberately sharing NO code with Spark's
  * XXH64 implementation so it can serve as an independent computation
  * path for the hash-kernel replays below.
  */
object Xxh64Replay {
  val P1 = 0x9E3779B185EBCA87L
  val P2 = 0xC2B2AE3D27D4EB4FL
  val P3 = 0x165667B19E3779F9L
  val P4 = 0x85EBCA77C2B2AE63L
  val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)
  private def round(acc: Long, k: Long): Long = rotl(acc + k * P2, 31) * P1
  private def merge(acc: Long, v: Long): Long = (acc ^ round(0L, v)) * P1 + P4
  private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^ (h >>> 32)
  }

  /** One 8-byte input (how Spark's xxhash64 folds a BIGINT child). */
  def hashLong(l: Long, seed: Long): Long = {
    var acc = seed + P5 + 8L
    acc ^= round(0L, l)
    acc = rotl(acc, 27) * P1 + P4
    avalanche(acc)
  }

  /** One 4-byte input (how Spark's xxhash64 folds an INT child). */
  def hashInt(i: Int, seed: Long): Long = {
    var acc = seed + P5 + 4L
    acc ^= (i & 0xFFFFFFFFL) * P1
    acc = rotl(acc, 23) * P2 + P3
    avalanche(acc)
  }

  /** Arbitrary byte stream (how Spark's xxhash64 folds a STRING child:
    * its UTF-8 bytes).
    */
  def hashBytes(b: Array[Byte], seed: Long): Long = {
    val len = b.length
    def readLong(i: Int): Long = {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (b(i + j) & 0xffL); j -= 1 }
      v
    }
    def readInt(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    var i = 0
    var acc =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i + 32 <= len) {
          v1 = round(v1, readLong(i)); v2 = round(v2, readLong(i + 8))
          v3 = round(v3, readLong(i + 16)); v4 = round(v4, readLong(i + 24))
          i += 32
        }
        var a = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        a = merge(a, v1); a = merge(a, v2); a = merge(a, v3); merge(a, v4)
      } else seed + P5
    acc += len
    while (i + 8 <= len) {
      acc ^= round(0L, readLong(i)); acc = rotl(acc, 27) * P1 + P4; i += 8
    }
    if (i + 4 <= len) {
      acc ^= readInt(i) * P1; acc = rotl(acc, 23) * P2 + P3; i += 4
    }
    while (i < len) {
      acc ^= (b(i) & 0xffL) * P5; acc = rotl(acc, 11) * P1; i += 1
    }
    avalanche(acc)
  }
}

/** Third-path authority replays for the hash-kernel dedup families
  * (r11 verdict task #4, extending the TpchReplaySpec discipline): the
  * minhash/simhash/winnowing keys were verified only by DuckDB mirrors
  * that deliberately REPRODUCE Spark's kernels — same author, both
  * sides. These tests recompute the FULL published result of
  * `dedup_minhash`, `dedup_simhash`, and `dedup_winnow` for the whole
  * sf0.001 corpus (500 docs) in plain driver Scala — string walks,
  * HashMaps and arithmetic written from the public algorithm specs
  * (FNV-1a, SplitMix64, XXH64, Charikar SimHash, Schleimer-Wilkerson-
  * Aiken winnowing) — sharing nothing with either the Catalyst
  * expressions (whose codegen is a second generated implementation) or
  * the SQL mirrors, and assert pair-for-pair equality.
  */
class HashKernelReplaySpec extends AnyFunSuite {
  import TestSpark._

  private val seed = 42L
  private val K = 128

  private def mix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // WordWalk re-derivation: lowercase fold, [a-z0-9] words, FNV-1a per
  // word finalized by mix64 (written against the documented contract,
  // not the expression code path)
  private def wordHashList(s: String): Vector[Long] = {
    val out = Vector.newBuilder[Long]
    var wh = 0xcbf29ce484222325L
    var inWord = false
    (s + " ").foreach { c =>
      val lc: Int =
        if (c >= 'A' && c <= 'Z') c + 32
        else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) c.toInt
        else if (c < 128) -1
        else {
          val l = Character.toLowerCase(c.toInt)
          if ((l >= 'a' && l <= 'z') || (l >= '0' && l <= '9')) l else -1
        }
      if (lc >= 0) { wh = (wh ^ lc) * 0x100000001b3L; inWord = true }
      else if (inWord) { out += mix64(wh); wh = 0xcbf29ce484222325L; inWord = false }
    }
    out.result()
  }

  private def shingleHashes(words: Vector[Long], shingleK: Int): Vector[Long] = {
    if (words.isEmpty) return Vector.empty
    val width = math.min(shingleK, words.length)
    val n = if (words.length <= shingleK) 1 else words.length - shingleK + 1
    (0 until n).map { i =>
      var h = 0xcbf29ce484222325L
      (0 until width).foreach(j => h = (h ^ words(i + j)) * 0x100000001b3L)
      mix64(h)
    }.toVector
  }

  private def minhashSig(text: String): Option[Array[Long]] = {
    val sh = shingleHashes(wordHashList(text), 3)
    if (sh.isEmpty) return None
    val mins = Array.fill(K)(Long.MaxValue)
    sh.foreach { h =>
      var i = 0
      while (i < K) {
        val v = h * (mix64(seed + 2L * i) | 1L) + mix64(seed + 2L * i + 1L)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    Some(mins)
  }

  // canonical words via the Text.canon contract (lowercase, [^a-z0-9]+
  // separators) — the regex pipeline the simhash/winnow keys tokenize with
  private def canonWords(s: String): Vector[String] = {
    val c = s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9]+", " ").trim
    if (c.isEmpty) Vector.empty else c.split(" ").toVector
  }

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, dir).select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("the XXH64 replica agrees with Spark's xxhash64 (diagnostic anchor)") {
    // not a law of the replay — a locator: if a pipeline replay below
    // fails, this says whether the hash primitive or the pipeline drifted
    import spark.implicits._
    val rows = Seq((7L, 3, "spark"), (-19L, 0, ""), (Long.MinValue, -5, "αβ kelvin"))
      .toDF("l", "i", "s")
      .select(xxhash64(col("l")), xxhash64(col("i")), xxhash64(col("s")),
        xxhash64(col("i"), col("l")))
      .collect()
    Seq((7L, 3, "spark"), (-19L, 0, ""), (Long.MinValue, -5, "αβ kelvin"))
      .zip(rows).foreach { case ((l, i, s), r) =>
        assert(r.getLong(0) === Xxh64Replay.hashLong(l, seed))
        assert(r.getLong(1) === Xxh64Replay.hashInt(i, seed))
        assert(r.getLong(2) === Xxh64Replay.hashBytes(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed))
        assert(r.getLong(3) === Xxh64Replay.hashLong(l, Xxh64Replay.hashInt(i, seed)))
      }
  }

  test("dedup_minhash replays pair-for-pair from raw text in plain Scala") {
    val sigs = docs.flatMap { case (id, t) => minhashSig(t).map(id -> _) }
    // banding: bh = xxhash64(band, sig[band*8 .. band*8+8)) with running
    // seed chaining (int child then each long element)
    val buckets = scala.collection.mutable.Map.empty[(Int, Long), List[Long]]
    sigs.foreach { case (id, sig) =>
      (0 until 16).foreach { b =>
        var h = Xxh64Replay.hashInt(b, seed)
        (0 until 8).foreach(j => h = Xxh64Replay.hashLong(sig(b * 8 + j), h))
        buckets((b, h)) = id :: buckets.getOrElse((b, h), Nil)
      }
    }
    assert(buckets.valuesIterator.map(_.size).max <= 1000,
      "replay assumes no bucket hits the maxBucketSize cap at sf0.001")
    val cand = buckets.valuesIterator.flatMap { ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val sigOf = sigs.toMap
    val replayed = cand.flatMap { case (a, b) =>
      val n = (0 until K).count(i => (sigOf(a)(i) & 0xffffL) == (sigOf(b)(i) & 0xffffL))
      val est = n.toDouble / K
      if (est >= 0.5) Some((a, b, est)) else None
    }
    val published = SparkEntry.queries("dedup_minhash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(published === replayed)
    assert(replayed.nonEmpty, "corpus must actually exercise the kernel")
  }

  test("dedup_simhash replays pair-for-pair from raw text in plain Scala") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val sims = docs.flatMap { case (id, t) =>
      val ws = canonWords(t)
      if (ws.isEmpty) None
      else {
        val votes = new Array[Int](64)
        ws.foreach { w =>
          val h = Xxh64Replay.hashBytes(w.getBytes(utf8), seed)
          (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
        }
        var sh = 0L
        (0 until 64).foreach(b => if (votes(b) > 0) sh |= (1L << b))
        Some(id -> sh)
      }
    }
    val buckets = scala.collection.mutable.Map.empty[(Int, Long), List[(Long, Long)]]
    sims.foreach { case (id, sh) =>
      (0 until 4).foreach { b =>
        val key = (b, (sh >>> (16 * b)) & 0xffffL)
        buckets(key) = (id, sh) :: buckets.getOrElse(key, Nil)
      }
    }
    val replayed = buckets.valuesIterator.flatMap { members =>
      for {
        (a, sa) <- members; (b, sb) <- members if a < b
        ham = java.lang.Long.bitCount(sa ^ sb) if ham <= 3
      } yield (a, b, ham.toLong)
    }.toSet
    val published = SparkEntry.queries("dedup_simhash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).asInstanceOf[Number].longValue)).toSet
    assert(published === replayed)
    assert(replayed.nonEmpty, "corpus must actually exercise the kernel")
  }

  test("dedup_winnow replays pair-for-pair from raw text in plain Scala") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes(utf8)).map("%02x".format(_)).mkString
    }
    val fps = docs.map { case (id, t) =>
      val ws = canonWords(t)
      val grams =
        if (ws.isEmpty) Vector.empty[String]
        else if (ws.length <= 4) Vector(ws.mkString(" "))
        else (0 to ws.length - 4).map(i => ws.slice(i, i + 4).mkString(" ")).toVector
      val hs = grams.map(md5hex)
      val sel =
        if (hs.isEmpty) Vector.empty[String]
        else if (hs.length < 5) Vector(hs.min)
        else (0 to hs.length - 5).map(i => hs.slice(i, i + 5).min).distinct.toVector
      id -> sel
    }
    val df = scala.collection.mutable.Map.empty[String, Long]
    fps.foreach { case (_, sel) => sel.foreach(f => df(f) = df.getOrElse(f, 0L) + 1L) }
    val byFp = scala.collection.mutable.Map.empty[String, List[Long]]
    fps.foreach { case (id, sel) =>
      sel.foreach(f => if (df(f) <= 50L) byFp(f) = id :: byFp.getOrElse(f, Nil))
    }
    val shared = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byFp.valuesIterator.foreach { ids =>
      for (a <- ids; b <- ids if a < b)
        shared((a, b)) = shared.getOrElse((a, b), 0L) + 1L
    }
    val replayed = shared.iterator.collect {
      case ((a, b), n) if n >= 2L => (a, b, n)
    }.toSet
    val published = SparkEntry.queries("dedup_winnow")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(published === replayed)
    assert(replayed.nonEmpty, "corpus must actually exercise the kernel")
  }
}

/** Gapped-series forecast discipline (r11 ADVICE): the naive baselines
  * of `q_forecast_eval` must predict from the count at day VALUE d-1 /
  * d-7 — dropping days whose predecessor DAY is absent — and
  * `q_events_forecast_reconcile` must degrade gracefully (forecast 0,
  * the oracle's COALESCE path) instead of crashing when the HW series
  * is short or the seasonal day is missing. The driver gate only sees
  * the dense corpus; these synthetic gapped/short series pin the
  * behavior the oracle SQL now encodes.
  */
class ForecastGapSpec extends AnyFunSuite {
  import TestSpark._

  private def writeEvents(days: Seq[Int], tag: String): String = {
    import spark.implicits._
    val tmp = TmpDirs.create(tag)
    val rows = for {
      d <- days
      i <- 0 until (3 + d % 5)
    } yield (d * 31 + i, // event_id
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(d * 86400L + i * 60L)),
      i % 7, Seq("view", "click", "buy")(i % 3), 1.0 + i, s"""{"k":$i}""")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q_forecast_eval naive legs lag by day value across gaps") {
    val days = Seq(0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 13, 14) // holes at 9, 12
    val dir = writeEvents(days, "fgap")
    val n = days.map(d => d -> (3L + d % 5)).toMap
    val sorted = days.sorted
    val scored = sorted.drop(7) // rn >= 8
    def leg(lag: Int) = {
      val terms = scored.filter(d => n.contains(d - lag))
        .map(d => (n(d), math.abs(n(d) - n(d - lag))))
      (terms.length.toLong, terms.map(_._1).sum, terms.map(_._2).sum)
    }
    val (e1, e7) = (leg(1), leg(7))
    assert(e1._1 < scored.length.toLong,
      "the gap must actually drop a lag-1 term or this test proves nothing")
    val out = SparkEntry.queries("q_forecast_eval")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("naive_lag1") === e1)
    assert(out("naive_lag7") === e7)
  }

  test("forecast reconcile degrades to forecast 0 instead of crashing") {
    // <8 days: the HW frame is empty — hw.last used to throw here
    val short = writeEvents(Seq(0, 1, 2, 3, 4), "fshort")
    val a = SparkEntry.queries("q_events_forecast_reconcile")(spark, short).collect()
    assert(a.nonEmpty && a.forall(r => r.getLong(2) === 0L && r.getLong(3) === 0L))
    // gapped at last_day-6: the seasonal row is absent — find(...).get
    // used to throw here
    val gapped = writeEvents((0 to 14).filterNot(_ == 8), "fseas")
    val b = SparkEntry.queries("q_events_forecast_reconcile")(spark, gapped).collect()
    assert(b.nonEmpty && b.forall(r => r.getLong(2) === 0L && r.getLong(3) === 0L))
  }
}

/** Laws of the HTML/boilerplate stripper (r11 verdict task #1 — the
  * first stage of a web-crawl corpus): chrome containers drop WITH
  * content, structural tags drop WITHOUT their content, and entities
  * decode AFTER tag stripping so text that discusses markup survives.
  */
class MarkupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.text.Markup

  private def strip(s: String): String =
    Seq(s).toDF("raw").select(Markup.stripHtml(col("raw"))).head().getString(0)

  test("chrome containers are removed with their content; structure keeps content") {
    val page = "<html><head><title>t</title><script>var x=1;</script></head>" +
      "<body><nav>home about</nav><h1>Title</h1><p>real <b>content</b> here</p>" +
      "<div class=\"ads\">buy now</div><footer>copyright</footer></body></html>"
    assert(strip(page) === "Title real content here")
  }

  test("entities decode after tag strip — markup-discussing text survives") {
    // a naive decode-first stripper would turn &lt;script&gt; into a tag
    // and strip it; the pipeline order keeps it as literal text
    assert(strip("<p>use &lt;script&gt; tags &amp; be careful</p>")
      === "use <script> tags & be careful")
    // double-encoded decodes ONE level (amp last), per the HTML spec
    assert(strip("<p>&amp;lt;</p>") === "&lt;")
  }

  test("the planted page strips back to exactly the framed document text") {
    val rows = SparkEntry.queries("text_html_strip")(spark, dir).collect()
    val texts = Tables.documents(spark, dir).select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val (id, stripped) = (r.getLong(0), r.getString(4))
      val entity = if (id % 5 == 0) " & fish <chips> deal" else ""
      val links = s" ref ${(id * 7 + 3) % 1000}" +
        (if (id % 2 == 1) s" ref ${(id * 13 + 5) % 1000}" else "")
      val expected = (s"Document $id " + texts(id) + entity + links)
        .replaceAll("\\s+", " ").trim
      assert(stripped === expected, s"doc $id mis-stripped")
      assert(r.getLong(1) > r.getLong(5), "raw must be strictly longer than stripped")
    }
  }

  test("stripping a markup-free document is whitespace normalization only") {
    assert(strip("plain  text   with spacing") === "plain text with spacing")
    assert(strip("") === "")
  }
}

/** Driver-Scala replays for the R12 statistics keys: Kruskal–Wallis H,
  * one-way ANOVA F, and the winsorized means recompute from raw rows
  * with plain HashMaps and BigInt arithmetic.
  */
class StatsReplaySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val rows: Seq[(Long, String)] =
    Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("q_kruskal_wallis replays from raw rows") {
    val out = SparkEntry.queries("q_kruskal_wallis")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    val n = rows.size.toLong
    val byV = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rank2 = {
      var cum = 0L
      byV.toSeq.sortBy(_._1).map { case (v, tv) =>
        val r = cum * 2 + tv + 1; cum += tv; v -> r
      }.toMap
    }
    val groups = rows.groupBy(_._2).view.mapValues { g =>
      (g.size.toLong, g.map(x => rank2(x._1)).sum)
    }.toMap
    val terms = groups.values.map { case (ng, rs) =>
      BigInt(ng) * BigInt(rs / ng - (n + 1)).pow(2)
    }.sum
    val h = (BigInt(3000) * terms / (BigInt(n) * BigInt(n + 1))).toLong
    val ties = byV.values.map(t => t * t * t - t).sum
    out.foreach { case (flag, (ng, rs, nTot, hM, tc)) =>
      assert((ng, rs) === groups(flag))
      assert(nTot === n && hM === h && tc === ties)
    }
    assert(h >= 0L)
  }

  test("q_anova_f replays from raw rows") {
    val out = SparkEntry.queries("q_anova_f")(spark, dir).collect()
    val groups = rows.groupBy(_._2).view.mapValues { g =>
      (g.size.toLong, g.map(_._1).sum, g.map(x => x._1 * x._1).sum)
    }.toMap
    val k = groups.size.toLong
    val n = rows.size.toLong
    val s = groups.values.map(_._2).sum
    val q = groups.values.map(_._3).sum
    val terms = groups.values.map { case (ng, sg, _) => sg * sg * 1000L / ng }.sum
    val ssb = terms - s * s * 1000L / n
    val ssw = q * 1000L - terms
    val f = (BigInt(ssb) * (n - k) * 1000 / (BigInt(ssw) * (k - 1))).toLong
    out.foreach { r =>
      val (ng, sg, qg) = groups(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((ng, sg, qg)))
      assert(r.getLong(4) === ssb && r.getLong(5) === ssw && r.getLong(6) === f)
      assert(r.getLong(7) === k - 1 && r.getLong(8) === n - k)
    }
    assert(ssb >= 0 && ssw > 0)
  }

  test("q_winsorized_stats clamps at exact order statistics") {
    val priced = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val out = SparkEntry.queries("q_winsorized_stats")(spark, dir).collect()
    out.foreach { r =>
      val flag = r.getString(0)
      val vs = priced.filter(_._1 == flag).map(_._2).sorted
      val n = vs.length.toLong
      val lo = vs(((n * 5 + 99) / 100 - 1).toInt)
      val hi = vs(((n * 95 + 99) / 100 - 1).toInt)
      assert(r.getLong(1) === n && r.getLong(2) === lo && r.getLong(3) === hi)
      val rawMean = vs.sum * 1000L / n
      val winMean = vs.map(v => math.max(lo, math.min(hi, v))).sum * 1000L / n
      assert(r.getLong(4) === rawMean && r.getLong(5) === winMean)
      // clamping can only pull the mean INTO [lo, hi]·1000
      assert(r.getLong(5) >= lo * 1000L && r.getLong(5) <= hi * 1000L)
    }
  }

  test("ann_hamming_recall is a lawful recall frame") {
    val out = SparkEntry.queries("ann_hamming_recall")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) === 10L, "truth depth is 10")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10L)
      assert(r.getLong(3) === r.getLong(2) * 1000L / r.getLong(1))
    }
  }
}

/** Driver-Scala replays for the R12 forecasting/pipeline wave. */
class CrostonMixSpec extends AnyFunSuite {
  import TestSpark._

  test("q_parts_croston replays the size/interval recursion from raw rows") {
    val pm = Tables.lineitem(spark, dir)
      .select(col("l_partkey").cast("long"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPart = pm.groupBy(_._1).view.mapValues { rows =>
      rows.groupBy(_._2).toSeq.map { case (mi, g) => (mi, g.map(_._3).sum) }.sortBy(_._1)
    }.toMap
    val out = SparkEntry.queries("q_parts_croston")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val series = byPart(r.getLong(0))
      assert(series.length >= 3 && r.getLong(1) === series.length.toLong)
      var z = series.head._2
      var iv = 0L
      var last = series.head._1
      series.drop(1).zipWithIndex.foreach { case ((mi, d), i) =>
        z = (z + d) / 2
        iv = if (i == 0) mi - last else (iv + (mi - last)) / 2
        last = mi
      }
      assert(r.getLong(2) === z && r.getLong(3) === iv)
      assert(r.getLong(4) === z * 1000 / math.max(iv, 1L))
    }
  }

  test("pipe_mix_schedule anneals toward balance across epochs") {
    val out = SparkEntry.queries("pipe_mix_schedule")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4)))
    val epochs = out.groupBy(_._1)
    assert(epochs.keySet === Set(1L, 2L, 3L))
    // epoch 1 (tau=1) is proportional: budget ≈ total/2 (floor)
    epochs(1L).foreach { case (_, _, tot, b) =>
      assert(math.abs(b - tot / 2) <= 1L, "tau=1 must be proportional")
    }
    // annealing flattens: the budget SPREAD across sources shrinks
    def spread(e: Long): Long = {
      val bs = epochs(e).map(_._4)
      bs.max - bs.min
    }
    assert(spread(1L) >= spread(2L) && spread(2L) >= spread(3L),
      "lower tau must flatten the budget allocation")
    // each epoch's budgets respect the half-corpus budget
    val grand = epochs(1L).map(_._3).sum
    epochs.values.foreach { rows =>
      assert(rows.map(_._4).sum <= grand / 2 + rows.size)
    }
  }

  test("pipe_curriculum_order phases cover every countable doc with monotone ranges") {
    val out = SparkEntry.queries("pipe_curriculum_order")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSeq === out.map(_._1).toSeq.sorted)
    val totalDocs = out.map(_._2).sum
    val withWords = Tables.documents(spark, dir)
      .where(graft.text.Text.wordCount(col("text")) > 0).count()
    assert(totalDocs === withWords, "every doc with words lands in exactly one phase")
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._5 <= b._4, "phase difficulty ranges must not interleave")
      case _ => ()
    }
  }

  test("q_price_index replays one month pair from the raw grid") {
    val out = SparkEntry.queries("q_price_index")(spark, dir).collect()
    assert(out.nonEmpty)
    val pm = Tables.lineitem(spark, dir)
      .select((year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast("long"),
        col("l_partkey").cast("long"), col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val grid = pm.groupBy(x => (x._1, x._2)).view
      .mapValues(g => (g.map(_._3).sum, g.map(_._4).sum)).toMap
    val mid = out(out.length / 2)
    val mi = mid.getLong(0)
    val matched = grid.keySet.filter(_._1 == mi).map(_._2)
      .intersect(grid.keySet.filter(_._1 == mi - 1).map(_._2))
    assert(mid.getLong(1) === matched.size.toLong)
    val (qm, rm) = matched.toSeq.map(p => grid((mi, p))).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val (qp, rp) = matched.toSeq.map(p => grid((mi - 1, p))).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(mid.getLong(2) === qm && mid.getLong(3) === rm)
    assert(mid.getLong(4) === rm * 1000 / qm)
    assert(mid.getLong(5) === rp * 1000 / qp)
    assert(mid.getLong(6) === (rm * 1000 / qm) * 1000 / (rp * 1000 / qp))
  }
}

/** Driver-Scala replays + laws for the R12 filtered-ANN/CEP/power wave. */
class FilteredCepPowerSpec extends AnyFunSuite {
  import TestSpark._

  test("ann_filtered_topk pre-filters: every result shares the query's label") {
    val out = SparkEntry.queries("ann_filtered_topk")(spark, dir).collect()
    assert(out.nonEmpty)
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) === labels(r.getLong(0)), "published label is the query's")
      assert(labels(r.getLong(2)) === r.getLong(1), "pre-filter: results share the label")
      assert(r.getLong(4) >= 1L && r.getLong(4) <= 5L)
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 10L, "post-filter yield is out of 10")
    }
    // the deliverable: on 10 labels, the unfiltered top-10 rarely
    // yields 5 same-label hits — pre-filtering demonstrably matters
    val yields = out.groupBy(_.getLong(0)).map(_._2.head.getLong(5))
    assert(yields.exists(_ < 5L),
      "at least one query must show a post-filter shortfall on this corpus")
  }

  test("q_events_pattern replays the negative-condition match from raw rows") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val win = 30L * 60L * 1000000000L
    val expected = ev.groupBy(_._1).view.mapValues { rows =>
      val sorted = rows.sortBy(e => (e._4, e._2))
      var lastView = Option.empty[Long]
      var lastError = Option.empty[Long]
      var np = 0L
      var nm = 0L
      sorted.foreach { case (_, _, tpe, ts) =>
        if (tpe == "purchase") {
          np += 1
          val ok = lastView.exists(v => ts - v <= win &&
            lastError.forall(_ < v))
          if (ok) nm += 1
        }
        if (tpe == "view") lastView = Some(ts)
        if (tpe == "error") lastError = Some(ts)
      }
      (np, nm)
    }.toMap.filter(_._2._1 > 0)
    val out = SparkEntry.queries("q_events_pattern")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === expected)
    assert(out.values.exists(_._2 > 0), "corpus must contain real matches")
    assert(out.exists { case (u, (np, nm)) => nm < np },
      "corpus must also exercise the negative condition")
  }

  test("q_ab_power replays the MDE float chain from the arm counts") {
    val r = SparkEntry.queries("q_ab_power")(spark, dir).head()
    val (n1, c1, n2, c2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n1 > 0 && n2 > 0)
    val lift = c1.toDouble / n1 - c2.toDouble / n2
    val pbar = (c1 + c2).toDouble / (n1 + n2)
    val mde = 2.8016 * math.sqrt((pbar * (1.0 - pbar)) * (1.0 / n1 + 1.0 / n2)) * 1e6
    assert(r.getLong(6) === java.math.BigDecimal.valueOf(lift * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
    assert(r.getLong(7) === java.math.BigDecimal.valueOf(mde)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
    assert(r.getLong(8) === (if (math.abs(r.getLong(6)) >= r.getLong(7)) 1L else 0L))
  }
}

/** Streaming CEP twin: the flatMapGroupsWithState pattern matcher must
  * agree with the batch negative-condition key row-for-row, and its
  * per-user state is two timestamps regardless of stream length.
  */
class PatternStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streamed pattern matches equal the batch key per user") {
    val streamed = streaming.EventsStream.runToMemory(
      spark, streaming.PatternStream.matches(spark, dir).toDF(), "pattern_out", "append")
    val s = streamed.groupBy("user_id")
      .agg(count(lit(1)).as("np"),
        sum(when(col("matched"), 1L).otherwise(0L)).as("nm"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val b = SparkEntry.queries("q_events_pattern")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(s === b)
    assert(s.nonEmpty)
  }

  test("the fold's state transitions are the batch semantics") {
    import streaming.PatternStream._
    val t0 = 1000L * 1000000000L
    var st = PatState(None, None)
    // purchase with no prior view: no match
    val (st1, m1) = step(st, Ev(1, 1, "purchase", t0))
    assert(m1.exists(!_.matched))
    // view then purchase inside the window: match
    val (st2, _) = step(st1, Ev(1, 2, "view", t0 + 1))
    val (st3, m3) = step(st2, Ev(1, 3, "purchase", t0 + 2))
    assert(m3.exists(_.matched))
    // error between view and purchase kills the match
    val (st4, _) = step(st3, Ev(1, 4, "error", t0 + 3))
    val (st5, m5) = step(st4, Ev(1, 5, "purchase", t0 + 4))
    assert(m5.exists(!_.matched))
    // a NEW view after the error revives it
    val (st6, _) = step(st5, Ev(1, 6, "view", t0 + 5))
    val (_, m7) = step(st6, Ev(1, 7, "purchase", t0 + 6))
    assert(m7.exists(_.matched))
    // stale view outside 30 min: no match
    val (_, m8) = step(st6, Ev(1, 8, "purchase", t0 + 5 + WindowNs + 1))
    assert(m8.exists(!_.matched))
  }
}

/** Laws of the sampled-frame video fingerprint (the CAS dedup story's
  * video leg).
  */
class VideoMatchSpec extends AnyFunSuite {
  import TestSpark._
  import graft.mm.Multimodal

  test("sampled video fingerprints recover exactly the planted duplicate groups") {
    val frame = Multimodal.dupVideoFrame(spark, Tables.documents(spark, dir))
    val fps = Multimodal.videoFingerprints(spark, frame).collect()
    val groups = fps.groupBy(_.fp).values.map(_.map(_.doc_id).sorted.toSeq).toSet
    val expected = Tables.documents(spark, dir).select(col("doc_id").cast("long"))
      .collect().map(_.getLong(0)).groupBy(_ % 40).values.map(_.sorted.toSeq).toSet
    assert(groups === expected)
    fps.foreach(r => assert(r.n_frames === 2 + (r.doc_id % 40 % 3).toInt))
  }

  test("the fingerprint reads decoded pixels, not container bytes") {
    import spark.implicits._
    // same pixels, different PNG byte streams (re-encode) must collide;
    // one flipped pixel must split
    val img = Multimodal.syntheticImage(5L, 0, 8, 8)
    val png1 = Multimodal.encodePng(img)
    val png2 = Multimodal.encodePng(Multimodal.decodeImage(png1)) // re-encode
    val imgX = Multimodal.syntheticImage(5L, 0, 8, 8)
    imgX.setRGB(3, 3, (imgX.getRGB(3, 3) & 0xff) ^ 0x01 | 0xff000000)
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.encodeVideo(Seq(png1)), "v"),
      Multimodal.MediaRow(2L, Multimodal.encodeVideo(Seq(png2)), "v"),
      Multimodal.MediaRow(3L, Multimodal.encodeVideo(Seq(Multimodal.encodePng(imgX))), "v"))
    val fp = Multimodal.videoFingerprints(spark, spark.createDataset(rows))
      .collect().map(r => r.doc_id -> r.fp).toMap
    assert(fp(1L) === fp(2L), "re-encoded identical pixels must match")
    assert(fp(1L) !== fp(3L), "a flipped pixel must split the group")
  }
}

/** Final R12 wave: winnowing eval laws + a plain-Scala BFS replay of
  * the crawl-graph reach.
  */
class WinnowEvalCrawlKhopSpec extends AnyFunSuite {
  import TestSpark._

  test("dedup_winnow_eval confusion counts are lawful and consistent with both legs") {
    val r = SparkEntry.queries("dedup_winnow_eval")(spark, dir).head()
    val (nPred, nTruth, tp, fp, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(tp + fp === nPred && tp + fn === nTruth)
    assert(nPred === SparkEntry.queries("dedup_winnow")(spark, dir).count())
    assert(nTruth === SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).count())
    assert(r.getLong(5) === tp * 1000 / math.max(nPred, 1L))
    assert(r.getLong(6) === tp * 1000 / math.max(nTruth, 1L))
    assert(nPred > 0 && nTruth > 0, "both legs must fire on this corpus")
  }

  test("q_crawl_khop replays a plain-Scala BFS over the planted link formula") {
    val ids = Tables.documents(spark, dir).select(col("doc_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val edges = ids.toSeq.flatMap { id =>
      val t1 = (id * 7 + 3) % 1000
      val t2 = (id * 13 + 5) % 1000
      Seq(id -> t1).filter(e => ids(e._2) && e._1 != e._2) ++
        (if (id % 2 == 1) Seq(id -> t2).filter(e => ids(e._2) && e._1 != e._2) else Nil)
    }.toSet
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seed = edges.toSeq.groupBy(_._2).view.mapValues(_.size).toSeq
      .maxBy { case (b, d) => (d, -b) }._1
    var frontier = Set(seed)
    var seen = Map(seed -> 0L)
    (1 to 3).foreach { h =>
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(seen.contains)
      seen ++= frontier.map(_ -> h.toLong)
    }
    val expected = seen.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = SparkEntry.queries("q_crawl_khop")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === expected)
    assert(out(0L) === 1L, "hop 0 is the seed alone")
  }
}

/** Laws of the sampled-window audio fingerprint (r11 verdict task #5:
  * `mm_audio_match` is now O(windows) per track, not O(samples)).
  */
class AudioSampledFpSpec extends AnyFunSuite {
  import TestSpark._
  import graft.mm.Audio

  test("sampled fingerprints recover exactly the full-digest duplicate groups") {
    val frame = Audio.dupAudioFrame(spark, Tables.documents(spark, dir))
    val full = Audio.fingerprints(spark, frame).collect()
      .groupBy(_.fp).values.map(_.map(_.doc_id).sorted.toSeq).toSet
    val sampled = Audio.sampledFingerprints(spark, frame).collect()
    val sampledGroups = sampled.groupBy(_.fp).values.map(_.map(_.doc_id).sorted.toSeq).toSet
    assert(sampledGroups === full,
      "byte-identical planted groups must partition identically under both digests")
    // n_samples must come out of the header identically on both paths
    val nFull = Audio.fingerprints(spark, frame).collect()
      .map(r => r.doc_id -> r.n_samples).toMap
    sampled.foreach(r => assert(r.n_samples === nFull(r.doc_id)))
  }

  test("length is part of the sampled identity; only sampled windows are") {
    import spark.implicits._
    val n = Audio.sampleCount(3L)
    def wav(mut: Int => Option[Byte]): Array[Byte] = {
      val buf = Array.tabulate(n)(i =>
        mut(i).getOrElse(Audio.sampleValue(3L, i).toByte))
      Audio.encodeWav(buf)
    }
    val starts = graft.mm.Multimodal.sampleIndices(n, 8)
    // a byte INSIDE the first sampled window flips the fingerprint
    val inWin = starts(0)
    // a byte between window 0's end and window 1's start is NOT sampled
    val outWin = starts(0) + 100
    assert(outWin < starts(1), "mutation site must fall between windows")
    val rows = Seq(
      Audio.AudioRow(1L, wav(_ => None), "audio/wav"),
      Audio.AudioRow(2L, wav(i => if (i == inWin) Some(9.toByte) else None), "audio/wav"),
      Audio.AudioRow(3L, wav(i => if (i == outWin) Some(9.toByte) else None), "audio/wav"))
    val fp = Audio.sampledFingerprints(spark, spark.createDataset(rows))
      .collect().map(r => r.doc_id -> r.fp).toMap
    assert(fp(1L) !== fp(2L), "sampled-window content is part of the identity")
    assert(fp(1L) === fp(3L), "unsampled bytes are outside the screen identity (documented trade)")
    // different durations never collide even when every sampled window agrees
    val frame = Audio.dupAudioFrame(spark, Tables.documents(spark, dir))
    val byLen = Audio.sampledFingerprints(spark, frame).collect().groupBy(_.n_samples)
    val fpsAcrossLens = byLen.values.map(_.map(_.fp).toSet).toSeq
    fpsAcrossLens.combinations(2).foreach { case Seq(x, y) =>
      assert(x.intersect(y).isEmpty, "tracks of different lengths must never share a fingerprint")
    }
  }
}
