package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the stack-based depth-counting chrome parser
  * (functions.StripChromeNested — the nesting-correct twin of the regex
  * chain) and its composed strip pipeline.
  */
class StripChromeNestedSpec extends AnyFunSuite {
  import TestSpark._
  import graft.functions.StripChromeNested.strip
  import spark.implicits._

  private def stripped(s: String): String =
    Seq(s).toDF("raw").select(text.Markup.stripHtmlNested(col("raw"))).head().getString(0)

  test("the expression's chrome set is Markup's chrome set") {
    assert(graft.functions.StripChromeNested.ChromeNames === text.Markup.ChromeTags.toSet)
  }

  test("nested same-name containers remove to the MATCHING close") {
    assert(strip("a<div class=\"ads\">x<div class=\"ads\">y</div>z</div>b") === "a b")
    assert(strip("a<aside>x<aside>y</aside>z</aside>b") === "a b")
    // triple depth
    assert(strip("<aside>1<aside>2<aside>3</aside>4</aside>5</aside>ok") === " ok")
    // a plain inner div still counts toward the ads container's depth
    assert(strip("<div class=\"ads\">x<div>y</div>z</div>keep") === " keep")
  }

  test("prefix-colliding names are NOT chrome (the <header> ADVICE case)") {
    assert(strip("<header>banner</header><head>gone</head>") === "<header>banner</header> ")
    assert(strip("<navbar>menu</navbar>") === "<navbar>menu</navbar>")
  }

  test("self-closing chrome, unterminated containers, lone '<'") {
    assert(strip("a<script/>b") === "a b")
    assert(strip("a<script>never closed") === "a ")
    assert(strip("1 < 2 and <div class=\"ads\">x</div>3 < 4") === "1 < 2 and  3 < 4")
    // a lone '<' INSIDE a removed container must not swallow the close
    assert(strip("<div class=\"ads\">x < y</div>kept") === " kept")
  }

  test("non-chrome tags pass through verbatim (tag strip is the next stage)") {
    assert(strip("<p>a <b>c</b></p>") === "<p>a <b>c</b></p>")
  }

  test("stripHtmlNested equals stripHtml on every nesting-free planted page") {
    val docs = Tables.documents(spark, dir)
    val plant = SparkEntry.htmlPlantForSpec
    val both = docs.select(
      text.Markup.stripHtml(plant).as("a"),
      text.Markup.stripHtmlNested(plant).as("b"))
      .collect()
    both.foreach(r => assert(r.getString(0) === r.getString(1)))
    assert(both.nonEmpty)
  }

  test("the nested plant strips back to exactly the framed document text") {
    val rows = SparkEntry.queries("text_html_strip_nested")(spark, dir).collect()
    val texts = Tables.documents(spark, dir).select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val (id, s) = (r.getLong(0), r.getString(2))
      val expected = (s"site banner Doc $id " + texts(id) + " <nested>")
        .replaceAll("\\s+", " ").trim
      assert(s === expected, s"doc $id mis-stripped")
    }
  }
}

/** Third-path replay of the batched real-vocab BPE fit: raw parquet
  * text is collected, unit-chunked, and greedily merged with a plain
  * fold written INDEPENDENTLY of text.Bpe.fitMergesBatched (own
  * counting, own ranking, own rewrite), then compared merge-for-merge
  * against the published `text_bpe_vocab` frame — the DuckDB oracle
  * being the second path.
  */
class BpeBatchedReplaySpec extends AnyFunSuite {
  import TestSpark._

  // the MULTILINGUAL canon (R14: the fit corpus is the script-planted
  // corpus): same keep-class string as Text.uniCanonClass — a shared
  // CONSTANT like HllReplaySpec's estimator tables, not shared logic
  private def canonWords(s: String): Vector[String] = {
    val c = s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^" + text.Text.uniCanonClass + "]+", " ").trim
    if (c.isEmpty) Vector.empty else c.split(" ").toVector
  }

  /** The script plant replayed in plain Scala (samples are shared
    * constants from SparkEntry — inputs, not logic).
    */
  private def plant(docId: Long, t: String): String = (docId % 11) match {
    case 1 => SparkEntry.cyrSample
    case 2 => SparkEntry.greSample
    case 3 => SparkEntry.hanSample
    case 4 => t + " " + SparkEntry.cyrSample
    case 5 => SparkEntry.araSample
    case 6 => SparkEntry.devSample
    case 7 => SparkEntry.hangulSample
    case _ => t
  }

  private def units(ws: Vector[String]): Vector[String] =
    ws.grouped(2).map(g => g.mkString("_")).toVector

  private def replayFit(dict: Seq[(String, Long)], stages: Int, topN: Int)
      : Seq[(Int, Int, String, String, Long)] = {
    var cur = dict.map { case (w, n) => (w.iterator.map(c => s"|$c|").mkString, n) }
    val merges = Seq.newBuilder[(Int, Int, String, String, Long)]
    var step = 0
    for (stage <- 1 to stages) {
      val counts = scala.collection.mutable.LinkedHashMap[(String, String), Long]()
      cur.foreach { case (ts, n) =>
        val tk = ts.substring(1, ts.length - 1).split("\\|\\|", -1)
        tk.sliding(2).filter(_.length == 2).foreach { p =>
          val k = (p(0), p(1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
        }
      }
      val top = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(topN)
      val kept = top.zipWithIndex.collect {
        case (((a, b), c), rn)
            if !top.take(rn).exists { case ((qa, qb), _) =>
              Set(qa, qb).intersect(Set(a, b)).nonEmpty } => (a, b, c)
      }
      kept.zipWithIndex.foreach { case ((a, b, c), i) =>
        step += 1; merges += ((step, stage, a, b, c))
      }
      kept.foreach { case (a, b, _) =>
        cur = cur.map { case (ts, n) => (ts.replace(s"|$a||$b|", s"|$a$b|"), n) }
      }
    }
    merges.result()
  }

  test("text_bpe_vocab replays merge-for-merge from raw text in plain Scala") {
    val texts = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => plant(r.getLong(0), r.getString(1))).toSeq
    val dict = texts.flatMap(t => units(canonWords(t)))
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
      .sortBy { case (w, n) => (-n, w) }.take(65536)
    val replayed = replayFit(dict, 96, 8)
    val published = SparkEntry.queries("text_bpe_vocab")(spark, dir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(published === replayed)
    assert(replayed.nonEmpty)
  }

  test("the fit yields a realistic (>=256) merge table at sf0.01 and keeps stages symbol-disjoint") {
    val merges = SparkEntry.queries("text_bpe_vocab")(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(merges.length >= 256, s"expected >=256 merges, got ${merges.length}")
    merges.groupBy(_._1).foreach { case (_, ms) =>
      val pairs = ms.map(m => (m._2, m._3))
      pairs.zipWithIndex.foreach { case ((a, b), i) =>
        pairs.take(i).foreach { case (qa, qb) =>
          assert(qa != a && qa != b && qb != a && qb != b,
            s"stage must keep symbol-disjoint merges: ($qa,$qb) vs ($a,$b)")
        }
      }
    }
  }

  test("pipe_token_mix_bpe admits in doc_id order within each source budget") {
    val rows = SparkEntry.queries("pipe_token_mix_bpe")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      // cum_before is the running sum of admitted tokens in id order —
      // the greedy-admission invariant
      sorted.zipWithIndex.foreach { case ((_, _, toks, cum), i) =>
        val expect = sorted.take(i).map(_._3).sum
        assert(cum === expect)
        assert(toks >= 0L)
      }
    }
  }
}

/** Third-path replay of the HLL++ register→estimate path
  * (`q_approx_distinct`): registers, raw estimate, bias K-NN window and
  * small-range correction recomputed with plain Scala from raw rows —
  * the estimator tables are the published HLL++ paper constants (read
  * from Spark's helper so they cannot drift) but every fold here is the
  * spec's own.
  */
class HllReplaySpec extends AnyFunSuite {
  import TestSpark._

  test("q_approx_distinct replays register-for-register in plain Scala") {
    val rsd = 0.05
    val p = math.ceil(2.0d * math.log(1.106d / rsd) / math.log(2.0d)).toInt
    val m = 1 << p
    val H = org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
    val raw = H.RAW_ESTIMATE_DATA(p - 4)
    val bias = H.BIAS_DATA(p - 4)
    val thresh = H.THRESHOLDS(p - 4)
    val kNN = H.K
    val alphaM2 = 0.7213d / (1.0d + 1.079d / m) * m * m

    val rows = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
      .where(col("user_id").isNotNull)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = rows.groupBy(_._1).map { case (t, g) => t -> g.map(_._2).toSet }

    val replayed = byType.map { case (t, users) =>
      val regs = new Array[Int](m)
      users.foreach { u =>
        val x = Xxh64Replay.hashLong(u, 42L)
        val reg = (x >>> (64 - p)).toInt
        val shifted = ((x & ((1L << (64 - p)) - 1)) << p) | (1L << (p - 1))
        val rho = java.lang.Long.numberOfLeadingZeros(shifted) + 1
        if (rho > regs(reg)) regs(reg) = rho
      }
      val v = regs.count(_ == 0)
      // zInverse summed in REGISTER order like the SQL fold: dyadic
      // rationals, so order cannot matter anyway
      val zi = regs.map(r => 1.0 / math.pow(2.0, r)).sum
      val e = alphaM2 / zi
      val est =
        if (e < 5.0 * m) {
          // 6-nearest-neighbor bias window: slide while the upper
          // neighbor is closer than the lower one
          var lw = math.max(raw.count(_ < e) - kNN + 1, 0)
          var hg = math.min(lw + kNN, raw.length)
          while (hg < raw.length &&
            (e - raw(hg)) * (e - raw(hg)) < (e - raw(lw)) * (e - raw(lw))) {
            lw += 1; hg += 1
          }
          e - bias.slice(lw, hg).sum / (hg - lw)
        } else e
      val hSmall = if (v > 0) m.toDouble * math.log(m.toDouble / v) else est
      val out = if (hSmall <= thresh) hSmall else est
      t -> (math.floor(out + 0.5).toLong, users.size.toLong)
    }

    val published = SparkEntry.queries("q_approx_distinct")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(published === replayed)
    assert(replayed.nonEmpty)
  }
}

/** Third-path replay of the hashed quality classifier
  * (`text_quality_model`): Gopher labels, the 64-bucket centered
  * keep-rate fit, and every document's score recomputed from raw rows
  * with plain HashMaps + BigInt — nothing shared with the Catalyst plan
  * or the DuckDB mirror.
  */
class QualityModelReplaySpec extends AnyFunSuite {
  import TestSpark._
  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def canonWords(s: String): Vector[String] = {
    val c = s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9]+", " ").trim
    if (c.isEmpty) Vector.empty else c.split(" ").toVector
  }

  private def gopherKeep(text: String): Boolean = {
    val ws = canonWords(text)
    val n = ws.length.toLong
    val distinct = ws.distinct.length.toLong
    val topN = if (ws.isEmpty) 0L else ws.groupBy(identity).valuesIterator.map(_.length).max.toLong
    val symbols = text.count(c =>
      !((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == ' ')).toLong
    val nChars = text.length.toLong
    val dupFrac = if (n == 0) 0.0 else (n - distinct).toDouble / n
    val topFrac = if (n == 0) 0.0 else topN.toDouble / n
    val symRatio = if (nChars == 0) 0.0 else symbols.toDouble / nChars
    n >= 5 && n <= 1000 && dupFrac < 0.6 && topFrac < 0.2 && symRatio < 0.3
  }

  test("text_quality_model replays fit + scores from raw text in plain Scala") {
    val docs = Tables.documents(spark, dir).select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val keepOf = docs.map { case (id, t) => id -> gopherKeep(t) }.toMap
    // fit: per bucket, token keep-rate centered at the corpus base rate
    val tot = new Array[Long](64); val kept = new Array[Long](64)
    docs.foreach { case (id, t) =>
      val k = keepOf(id)
      canonWords(t).foreach { w =>
        val b = (Xxh64Replay.hashBytes(w.getBytes(utf8), 42L) & 63L).toInt
        tot(b) += 1
        if (k) kept(b) += 1
      }
    }
    def rate(k: Long, t: Long): Long = ((BigInt(k) * 2000000) / BigInt(t)).toLong
    val allTot = tot.sum; val allKept = kept.sum
    val base = if (allTot == 0) 0L else rate(allKept, allTot)
    val w = Array.tabulate(64)(b => if (tot(b) == 0) 0L else rate(kept(b), tot(b)) - base)

    val replayed = docs.map { case (id, t) =>
      val ws = canonWords(t)
      val score = ws.map(x => w((Xxh64Replay.hashBytes(x.getBytes(utf8), 42L) & 63L).toInt)).sum
      id -> (ws.length.toLong, score, score > 0L)
    }.toMap
    val published = SparkEntry.queries("text_quality_model")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(published === replayed)
    assert(replayed.values.exists(_._3) && replayed.values.exists(!_._3),
      "corpus must exercise both classes")
  }
}

/** Laws of the O(n)-output setsim representative mode and the
  * script-first language ID.
  */
class R13OperatorLawsSpec extends AnyFunSuite {
  import TestSpark._

  test("dedup_setsim_reps assignments are a subset of the pair-complete join") {
    // sf0.01: the smallest scale where the corpus plants qualifying
    // 0.7-Jaccard pairs for the anchor collapse to exercise
    val d01 = "/root/testdata/sf0.01"
    val pairs = SparkEntry.queries("dedup_setsim_prefix")(spark, d01).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    val reps = SparkEntry.queries("dedup_setsim_reps")(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(reps.nonEmpty)
    // one row per doc, and every non-self assignment is a qualifying
    // pair of the certified pair-complete operator with the same jaccard
    assert(reps.map(_._1).distinct.length === reps.length)
    reps.filter(r => r._1 != r._2).foreach { case (d, rep, jacc) =>
      val key = (math.min(d, rep), math.max(d, rep))
      assert(pairs.contains(key), s"rep pair $key missing from prefix join")
      assert(pairs(key) === jacc)
      assert(jacc >= 700L)
    }
  }

  test("anchor collapse: planted duplicate groups fold onto their min-id anchor") {
    // the corpus's >=0.7 near-dups at sf0.01 happen not to share rarest
    // tokens (sf0.1 has 7 exact-dup collapses, oracle-gated) — the
    // collapse MECHANICS are pinned here on a planted frame instead
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      10L -> base, 11L -> base, 12L -> (base + " lambda"), // one dup group
      20L -> "one two three four five six seven eight nine ten",
      30L -> "completely different words entirely unrelated content here now")
      .toDF("doc_id", "text")
    val m = dedup.SetSim.anchorReps(
      docs.select(col("doc_id"),
        functions.exprs.shingle_block(col("text"), 3).getField("sh").as("sh")),
      tX1000 = 700, maxTokenDf = 1000)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(10L)._1 === 10L && m(10L)._2 === 1000L) // anchor keeps itself
    assert(m(11L) === (10L, 1000L)) // exact dup folds to the anchor
    assert(m(12L)._1 === 10L && m(12L)._2 >= 700L) // near dup folds too
    assert(m(20L)._1 === 20L) // singleton blocks keep themselves
    assert(m(30L)._1 === 30L)
  }

  test("planted scripts classify to their language; Latin falls back to stopwords") {
    val m = SparkEntry.queries("text_langid_script")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val ids = Tables.documents(spark, dir).select(col("doc_id").cast("long"))
      .collect().map(_.getLong(0))
    val nCyr = ids.count(i => i % 11 == 1 || i % 11 == 4).toLong
    val nGre = ids.count(_ % 11 == 2).toLong
    val nHan = ids.count(_ % 11 == 3).toLong
    val nAra = ids.count(_ % 11 == 5).toLong
    val nDev = ids.count(_ % 11 == 6).toLong
    val nHan2 = ids.count(_ % 11 == 7).toLong
    // script-planted docs sit exactly on the diagonal (code-switched
    // included — classified by script presence)
    assert(m.getOrElse(("ru", "ru"), 0L) === nCyr)
    assert(m.getOrElse(("el", "el"), 0L) === nGre)
    assert(m.getOrElse(("zh", "zh"), 0L) === nHan)
    assert(m.getOrElse(("ar", "ar"), 0L) === nAra)
    assert(m.getOrElse(("hi", "hi"), 0L) === nDev)
    assert(m.getOrElse(("ko", "ko"), 0L) === nHan2)
    // no unplanted doc predicts a script language (Latin text has no
    // script-range chars)
    val scriptOnly = Set("ru", "el", "ar", "hi", "ko")
    m.keys.foreach { case (t, p) =>
      if (scriptOnly.contains(p)) assert(scriptOnly.contains(t))
    }
  }
}
