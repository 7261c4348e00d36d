package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Third-path driver replay of the iterative-fit chain (r13 verdict
  * task #6): one Lloyd iteration of the IVF k-means and the per-subspace
  * PQ codebook fit recomputed from raw parquet rows in plain Scala —
  * nothing shared with the Catalyst plan (Cells.bestCell / PlaneDots /
  * the micro-unit integer partial sums) or with the DuckDB oracle's
  * unrolled CTE chain. With the mirror-only oracle this makes three
  * independent paths over the same kernel, the HashKernelReplaySpec
  * discipline extended to the last mirror-only family.
  */
class KmeansPqReplaySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val rows: Array[(Long, Array[Float])] =
    Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Cells.cellScores/bestCell replayed: cosine of v against every
    * centroid — dot and norm accumulated left-to-right exactly like
    * PlaneDots / the aggregate() fold — -2.0 for a zero vector, argmax
    * ties to the lowest index (array_position takes the FIRST max).
    */
  private def bestCell(v: Array[Float], cents: Array[Array[Double]]): Int = {
    var nv = 0.0
    var i = 0
    while (i < v.length) { nv += v(i).toDouble * v(i).toDouble; i += 1 }
    val scores = cents.map { c =>
      val n = math.min(v.length, c.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j).toDouble * c(j); j += 1 }
      val cn = math.sqrt(c.map(x => x * x).sum)
      if (nv == 0.0) -2.0 else dot / (math.sqrt(nv) * cn)
    }
    val mx = scores.max
    scores.indexWhere(_ == mx)
  }

  /** KMeans.fit replayed: init = the k lowest ids in id order; each
    * iteration assigns every row to its best cell and rebuilds
    * centroids from EXACT micro-unit integer sums (truncating cast,
    * like the SQL `CAST(x * 1000000 AS BIGINT)`) divided once at the
    * end; empty cells keep their previous centroid.
    */
  private def lloyd(
      data: Array[(Long, Array[Float])], k: Int, iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] =
      data.filter(_._1 < k).sortBy(_._1).map(_._2.map(_.toDouble))
    require(cents.nonEmpty)
    for (_ <- 0 until iters) {
      val dim = cents.map(_.length).max
      val sums = Array.ofDim[Long](cents.length, dim)
      val counts = new Array[Long](cents.length)
      data.foreach { case (_, v) =>
        val c = bestCell(v, cents)
        counts(c) += 1
        var p = 0
        while (p < v.length) {
          sums(c)(p) += (v(p).toDouble * 1000000).toLong
          p += 1
        }
      }
      val next = cents.map(_.clone())
      for (c <- cents.indices; p <- next(c).indices if counts(c) > 0)
        next(c)(p) = sums(c)(p).toDouble / (1e6 * counts(c))
      cents = next
    }
    cents
  }

  test("one Lloyd iteration of the IVF k-means replays bit-exact in plain Scala") {
    val sparkFit = ann.KMeans.fit(Tables.embeddings(spark, dir), 16, iters = 1)
    val replayed = lloyd(rows, 16, iters = 1)
    assert(sparkFit.length === replayed.length)
    sparkFit.zip(replayed).zipWithIndex.foreach { case ((a, b), c) =>
      assert(a.toSeq === b.toSeq, s"centroid $c diverged")
    }
    // the replay must have moved at least one centroid off its init
    // (otherwise the test proves nothing about the update step)
    val init = rows.filter(_._1 < 16).sortBy(_._1).map(_._2.map(_.toDouble))
    assert(replayed.map(_.toSeq).toSeq !== init.map(_.toSeq).toSeq)
  }

  test("the PQ per-subspace codebook fit replays bit-exact in plain Scala") {
    val sparkCb = ann.Pq.fittedCodebook(Tables.embeddings(spark, dir))
    assert(sparkCb.length === ann.Pq.m)
    (0 until ann.Pq.m).foreach { s =>
      val sub = rows.map { case (id, v) =>
        (id, v.slice(s * ann.Pq.dsub, s * ann.Pq.dsub + ann.Pq.dsub))
      }
      val replayed = lloyd(sub, ann.Pq.kCent, iters = 1)
      assert(sparkCb(s).length === replayed.length, s"subspace $s size")
      sparkCb(s).zip(replayed).zipWithIndex.foreach { case ((a, b), c) =>
        assert(a.toSeq === b.toSeq, s"subspace $s centroid $c diverged")
      }
    }
  }
}

/** Laws of the attribute-state self-closing detector (ADVICE r13: a '/'
  * that ends an UNQUOTED attribute value — `<nav data-u=http://x/>` —
  * is value content under the HTML5 tokenizer, not a self-closing
  * marker; only a '/' in name/whitespace position self-closes).
  */
class SelfClosingSpec extends AnyFunSuite {
  import graft.functions.StripChromeNested.strip

  test("unquoted attribute value ending in '/' does NOT self-close") {
    // nav opens as a container: its content must be REMOVED
    assert(strip("a<nav data-u=http://x/>menu</nav>b") === "a b")
    // and the depth increment inside removal mode must count it
    assert(strip("<nav>x<nav data-u=http://y/>deep</nav>still chrome</nav>ok") === " ok")
  }

  test("marker '/' after whitespace or quoted value still self-closes") {
    assert(strip("a<script/>b") === "a b")
    assert(strip("a<script />b") === "a b")
    assert(strip("a<nav id=\"x\"/>b") === "a b")
    assert(strip("a<nav id='x'/>b") === "a b")
    // quoted value may END in '/': the marker after the close-quote rules
    assert(strip("a<nav data-u=\"http://x/\"/>b") === "a b")
  }

  test("quoted '/' content never confuses the walk") {
    // quoted value containing '/>': the tag ends at the REAL '>'
    assert(strip("a<nav title=\"a/b\">x</nav>c") === "a c")
  }
}

/** Laws of the one-pass multilingual canon expression
  * (functions.CanonUni — the 12×-faster twin of the regex form): the
  * expression must equal the regex construction it replaced on every
  * content shape the corpora produce, and its duplicated keep-ranges
  * must never drift from Text.scriptRanges.
  */
class CanonUniSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def viaRegex(s: String): String =
    Seq(s).toDF("t").select(
      trim(regexp_replace(lower(col("t")), "[^" + text.Text.uniCanonClass + "]+", " ")))
      .head().getString(0)

  test("expression equals the regex form on ASCII, planted scripts, and junk") {
    val cases = Seq(
      "", "   ", "Hello, World! 42", "a_b c-d", "!!!", "a",
      "tab\tand\nnewline  runs",
      SparkEntry.cyrSample, SparkEntry.greSample, SparkEntry.hanSample,
      SparkEntry.araSample, SparkEntry.devSample, SparkEntry.hangulSample,
      "mixed " + SparkEntry.cyrSample + " tail!",
      "UPPER ДАННЫЕ case") // uppercase Cyrillic
    cases.foreach { s =>
      assert(graft.functions.CanonUni.canon(s) === viaRegex(s), s"input: $s")
    }
  }

  test("real-corpus equality: expression == regex on every planted doc") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text")).collect()
    docs.foreach { r =>
      val t = r.getString(1)
      assert(graft.functions.CanonUni.canon(t) === viaRegex(t))
    }
    assert(docs.nonEmpty)
  }

  test("the expression's keep-ranges are Text.scriptRanges") {
    val parsed = text.Text.scriptRanges.map { case (_, cls) =>
      val m = """\[\\x\{(\w+)\}-\\x\{(\w+)\}\]""".r.findFirstMatchIn(cls).get
      (Integer.parseInt(m.group(1), 16), Integer.parseInt(m.group(2), 16))
    }
    assert(parsed === graft.functions.CanonUni.KeepRanges.toSeq)
  }
}

/** Laws of the anchor-count sweep (`dedup_setsim_reps_sweep`): adding
  * an independent anchor permutation can only ADD candidate pairs, and
  * every emitted pair is Jaccard-verified at the truth threshold — so
  * within the sweep's own capped slice the curve is monotone and
  * self-consistent by construction, and the spec pins exactly that.
  */
class SetsimSweepLawsSpec extends AnyFunSuite {
  import TestSpark._

  test("recall curve is monotone in k and every emitted pair is truth") {
    val rows = SparkEntry.queries("dedup_setsim_reps_sweep")(spark, "/root/testdata/sf0.01")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // one shared truth leg
    assert(rows.map(_._2).distinct.length === 1)
    rows.foreach { case (_, _, nPred, nHit, _) =>
      // verified emission: every predicted pair clears the SAME
      // threshold truth is defined by, so hits == preds (precision 1000)
      assert(nHit === nPred)
    }
    // more anchors can only add candidates: pred and recall monotone
    rows.sliding(2).foreach { case Array((_, _, p1, _, r1), (_, _, p2, _, r2)) =>
      assert(p2 >= p1); assert(r2 >= r1)
    }
    // the sweep must actually buy recall on this corpus (k=3 over k=1)
    assert(rows.last._5 > rows.head._5)
  }
}

/** Routing law of the language-routed quality gate
  * (`pipe_quality_langroute`): the stopword fallback can never produce
  * a script language (disjoint label sets), so every doc labeled with a
  * script language came through the script cascade with script chars
  * present — i.e. script rows are FULLY script-routed and Latin rows
  * never are.
  */
class QualityLangrouteSpec extends AnyFunSuite {
  import TestSpark._

  test("script rows fully script-routed; Latin/und rows never") {
    val scriptLangs = text.Text.scriptRanges.map(_._1).toSet
    assert(scriptLangs.intersect(text.Text.stopwords.map(_._1).toSet).isEmpty)
    val rows = SparkEntry.queries("pipe_quality_langroute")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nRouted) =>
      if (scriptLangs.contains(lang)) assert(nRouted === nDocs, s"$lang")
      else assert(nRouted === 0L, s"$lang")
    }
    // both lanes must be exercised by the plant
    assert(rows.exists(r => scriptLangs.contains(r._1)))
    assert(rows.exists(r => !scriptLangs.contains(r._1)))
  }
}

/** Streaming exactly-once under RESTART-AFTER-FAILURE (r13 verdict task
  * #7): foreachBatch is at-least-once — a crash after the sink commit
  * but before the checkpoint commit replays the batch on restart — and
  * the production story is that [[graft.sinks.IdempotentAppend]]'s
  * marker guard turns that replay into a skip. This spec kills a
  * running stream exactly in that window (marker committed, checkpoint
  * not), restarts it on the SAME checkpoint dir, and proves (a) the
  * replay really happened, (b) the guard skipped it, (c) the table
  * holds every source row exactly once.
  */
class IdempotentStreamRestartSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("kill between marker commit and checkpoint commit -> restart yields single-copy output") {
    val root = TmpDirs.create("idemstream")
    val srcDir = s"$root/src"
    val table = s"$root/table"
    val ck = s"$root/ck"
    val schema = "id LONG, s STRING"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq((3L, "c"), (4L, "d")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(srcDir)

    // (batchId, wrotePerAppend) in invocation order, across both runs
    val log = scala.collection.mutable.ArrayBuffer[(Long, Boolean)]()
    def run(injectKill: Boolean): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1) // force one micro-batch per file
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val wrote = sinks.IdempotentAppend.append(b.toDF(), table, s"b$id")
          log += ((id, wrote))
          // the crash window: data + marker are durable, the
          // checkpoint commit for this batch has not happened yet
          if (injectKill && id == 0) throw new RuntimeException("injected kill")
        }
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    intercept[org.apache.spark.sql.streaming.StreamingQueryException] { run(injectKill = true) }
    assert(log.toList === List((0L, true))) // batch 0 committed its data+marker, then died
    run(injectKill = false) // restart, checkpoint dir preserved
    // batch 0 REPLAYED (at-least-once) and the marker guard SKIPPED it
    assert(log.toList === List((0L, true), (0L, false), (1L, true)))
    // single-copy output: every source row exactly once
    val out = spark.read.parquet(table).select("id", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toList
    assert(out === List((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }
}
