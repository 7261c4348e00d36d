package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bench {

  /** Host-factor calibration (r11 verdict: two consecutive rounds of
    * >1.5x bench flags were mostly the HOST — the judge's isolated
    * control rerun measured a 1.34x machine factor between measurement
    * sessions, not code drift). Ten pinned control keys whose code is
    * frozen, with their medians from the r14 FRESH-HOST baseline run of
    * the unchanged r13 tree (BENCH_BASELINE.json at 9e84845, sf0.1,
    * this suite's own median-of-3 protocol — the round-open fresh-host
    * ritual: bench the previous round's HEAD before any code lands, so
    * the pins and the per-key baseline share one host state; that run
    * measured host_factor 0.89 against the r13 pins, i.e. this host is
    * FASTER than the one the old pins were cut on). Every bench run
    * emits
    * `host_factor` = median over controls of (current median / pinned
    * median); cross-round comparisons divide per-key medians by it
    * before flagging, so BENCH artifacts separate "host" from "code"
    * without a judge rerun. Controls are chosen >0.25 s (jitter-proof)
    * and spread across families (agg, join, dedup, text, pipeline,
    * decode).
    * PROTOCOL: if a control key's implementation ever changes, repin its
    * reference median in the same commit.
    */
  // r15 repin (same commit as the minhashCandidatesFromSigs sketch-compare
  // fuse, which changes two control paths: dedup_minhash, pipe_corpus_prep):
  // in-suite medians of a full 3-pass sf0.1/32c bench of the fused tree
  // (/root/r15_mid_BENCH.json tail committed as BENCH_r15_repin.json).
  // Host-state continuity: at repin time the SAME session measured
  // host_factor 1.12-1.14 against the r14 fresh-host pins (control ratios
  // 0.98-1.45, median ~1.15), so these pins are ~15% above fresh-host
  // values and a later fresh-host run should read control_ratios ≈ 0.87.
  val controlRefHead = "r15repin-aa0863c+fuse"
  val controlRef: Map[String, Double] = Map(
    "q1_agg" -> 0.3625,
    "dedup_exact" -> 0.3700,
    "dedup_minhash" -> 1.2411,
    "q_join_shuffle" -> 0.4702,
    "pipe_corpus_prep" -> 3.6007,
    "text_bm25_topk" -> 1.2283,
    "q_window_topn" -> 0.6547,
    "q_local_volume" -> 0.9367,
    "mm_scene_cuts" -> 0.8542,
    "mm_phash_groups" -> 0.5781)

  /** R13 (r12 verdict task #2): a SCALAR host factor under-corrects —
    * the r12 close measured control ratios 1.06–2.76 on one host (map-
    * side keys degrade ~1.1× under load while shuffle-heavy ones hit
    * 2–3×), so three keys needed judge reruns to clear phantom flags.
    * Controls are therefore tagged with a COST FAMILY and a per-family
    * factor is emitted; regression flagging normalizes each key by ITS
    * family's factor. Families: `map` (scan/map-side/light-agg),
    * `shuffle` (wide-exchange dominated), `decode` (JDK codec bound).
    * Reference medians are pinned from the r14 fresh-host baseline run
    * of the UNCHANGED r13 tree (BENCH_BASELINE.json, git_head below).
    * Pins are sf0.1 medians; host factors
    * are only emitted when the run's sfDir matches (ADVICE r12: a
    * different-sf run must not conflate data scale with host drift).
    */
  val controlRefSfSuffix = "sf0.1"
  val controlFamily: Map[String, String] = Map(
    "q1_agg" -> "map",
    "text_bm25_topk" -> "map",
    "q_window_topn" -> "map",
    "q_local_volume" -> "map",
    "pipe_corpus_prep" -> "map",
    "dedup_exact" -> "shuffle",
    "dedup_minhash" -> "shuffle",
    "q_join_shuffle" -> "shuffle",
    "mm_scene_cuts" -> "decode",
    "mm_phash_groups" -> "decode")

  /** Key → cost family for net-of-family normalization. A prefix
    * heuristic, not a per-key audit: mm_* is decode-bound; the dedup/
    * ann/vec/pipe/samp families and the join/graph/sink shapes are
    * built around wide exchanges; the rest of the q_/text_/src_ surface
    * is scan + map + light-agg. Mis-tagging costs only flag noise —
    * the flags are triage pointers, not verdicts.
    */
  def familyOf(key: String): String =
    // a control key's audited tag wins over the prefix heuristic
    // (ADVICE r13: pipe_corpus_prep is tagged 'map' as a control but the
    // pipe_* prefix said 'shuffle' — the same key then contributed to one
    // family's factor while being normalized by the other's)
    controlFamily.getOrElse(key, familyHeuristic(key))

  private def familyHeuristic(key: String): String =
    if (key.startsWith("mm_")) "decode"
    else if (key.startsWith("dedup_") || key.startsWith("ann_") ||
      key.startsWith("vec_") || key.startsWith("pipe_") ||
      key.startsWith("samp_") || key.startsWith("q_graph_") ||
      key.startsWith("q_join") || key.startsWith("snk_")) "shuffle"
    else "map"

  /** Per-key medians of a previous round's BENCH_FULL.json (our own
    * format: the `"queries":{...}` object of one JSON line). Minimal
    * regex extraction — keys are [a-z0-9_]+, values plain doubles — so
    * Bench stays dependency-free.
    */
  def parseBaseline(path: java.nio.file.Path): Map[String, Double] = {
    val s = new String(java.nio.file.Files.readAllBytes(path))
    val qStart = s.indexOf("\"queries\":{")
    if (qStart < 0) Map.empty
    else {
      val body = s.substring(qStart + 11, s.indexOf('}', qStart))
      "\"([a-z0-9_]+)\":([0-9.eE+-]+)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  /** Run `nPasses` timed passes over `queries`. A query that throws is an
    * ERROR (`Left(message)`), not a time — it must never enter
    * medians/totals downstream. Public so the failure contract is
    * unit-testable with a deliberately broken query (BenchErrorSpec).
    */
  def timedPasses(
      spark: SparkSession,
      sfDir: String,
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
      nPasses: Int): Seq[Map[String, Either[String, Double]]] = {
    val names = queries.keys.toSeq
    (1 to nPasses).map { _ =>
      // between passes, outside any timed window: drive ContextCleaner so
      // dead shuffle files from the previous pass are gone before timing
      System.gc()
      Thread.sleep(2000)
      names.map { name =>
        // Per-query heap/cleaner hygiene, OUTSIDE the timed window: r7
        // measured bimodal 3x swings on individual queries (setsim 4.5s
        // vs 11.7s across passes) driven by garbage and un-reaped
        // shuffle state left by whichever queries happened to run
        // before; a forced GC plus a short cleaner-drain pause isolates
        // each query's timing from its neighbors.
        System.gc()
        Thread.sleep(100)
        val t0 = System.nanoTime()
        val res: Either[String, Double] =
          try { queries(name)(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.toString.take(300)}")
            Left(e.getClass.getName + ": " + String.valueOf(e.getMessage).take(200))
          }
        // several library functions hand back caller-owned persisted
        // results; drop them so no query's timing is distorted by the
        // accumulated caches (and heap pressure) of the queries before it
        spark.catalog.clearCache()
        // scratch-dir deletion happens outside the timed window of the NEXT
        // query too (dt is already captured), keeping timings write-only
        TmpDirs.sweepRecorded()
        name -> res
      }.toMap
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the box's cores: the driver pins SPARK_GRAFT_CPUS=32;
    // an unset local run should measure the same shape, not local[4]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // Reclaim scratch dirs from earlier/crashed runs BEFORE timing anything:
    // hundreds of stale graft_* dirs were measured to slow whole runs 2-7x.
    TmpDirs.sweepStale()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ContextCleaner reaps shuffle files only when driver GC collects
      // the RDD references; with a large heap that almost never happens
      // inside a bench run, so shuffle files from hundreds of timed
      // queries accumulate and later passes degrade (measured pass
      // totals 47s -> 50s -> 74s). The default periodic-GC interval is
      // 30min — far longer than a pass; 30s keeps cleanup continuous.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Uncounted warmup: run every query once so codegen compilation, AQE
    // machinery, and parquet reader setup are paid before timing; then
    // drop all cached/persisted data so the timed pass recomputes every
    // operator from the raw files (steady-state engine, cold data).
    // dev-only: SPARK_GRAFT_BENCH_KEYS=a,b,c restricts the run for
    // single-operator iteration; the driver leaves it unset (full suite).
    val keyFilter = sys.env.get("SPARK_GRAFT_BENCH_KEYS").map(_.split(',').toSet)
    val benched = keyFilter
      .map(ks => SparkEntry.queries.filter { case (n, _) => ks(n) })
      .getOrElse(SparkEntry.queries)
    benched.foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] warmup $name FAILED: ${e.toString.take(300)}")
      }
      spark.catalog.clearCache()
      TmpDirs.sweepRecorded()
    }
    // Extra decode warmup for the multimodal family: ImageIO plugin
    // scanning, font config, and JDK codec host caches warm lazily and
    // unevenly — one pass was measured to leave 1.4-3.8x drift flags in
    // committed bench artifacts that an isolated rerun couldn't reproduce.
    // Two additional uncounted decode passes before timing settle them.
    (1 to 2).foreach { _ =>
      benched.filter(_._1.startsWith("mm_")).foreach { case (name, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        spark.catalog.clearCache()
        TmpDirs.sweepRecorded()
      }
    }

    // Median-of-N timed passes: single-pass totals were measured to lie
    // by 2-7x under environmental noise (stale scratch dirs, GC timing),
    // so the reported per-query number is the median across passes and
    // the per-pass totals are published alongside as the spread record.
    val queries = benched
    val names = queries.keys.toSeq
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // A query that throws is an ERROR, not a time: its elapsed-to-throw is
    // recorded separately and NEVER enters medians/totals, the key is
    // listed in the errors map, and the run exits nonzero — a bench over a
    // broken engine must not look green (r7's 22 broken events queries
    // appeared as ~0.06s "passes" under the old swallow-everything catch).
    val perPass = timedPasses(spark, sfDir, queries, nPasses)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val m = s.length / 2
      if (s.length % 2 == 1) s(m) else (s(m - 1) + s(m)) / 2
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val erred: Seq[String] = names.filter(n => perPass.exists(_(n).isLeft))
    val ok: Seq[String] = names.filterNot(erred.contains)
    val errors = erred
      .map(n => jstr(n) + ":" + jstr(perPass.flatMap(_(n).left.toOption).head))
      .mkString("{", ",", "}")
    val medians = ok.map(n => n -> median(perPass.map(_(n).toOption.get)))
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = ok
      .map { n =>
        val xs = perPass.map(_(n).toOption.get)
        "\"" + n + "\":" + (xs.max - xs.min)
      }
      .mkString("{", ",", "}")
    // Isolated-rerun auto-annotation (r13 verdict task #5): a key whose
    // cross-pass spread exceeds its own median (q_graph_khop r13: 7.7 s
    // spread on an 8.1 s median) is pass-placement NOISE — shared
    // build-once artifacts, codegen, and page-cache warmup land on one
    // pass. Such keys are rerun ALONE (3 timings, same GC hygiene,
    // uncounted warmup first) and the isolated median is published
    // beside the in-suite one; net-of-family regression flagging uses
    // the isolated number, so the judge never re-adjudicates spread
    // noise. Controls keep their in-suite medians — the host factor
    // must measure the suite the pins were cut under.
    val spreadMap = ok.map { n =>
      val xs = perPass.map(_(n).toOption.get)
      n -> (xs.max - xs.min)
    }.toMap
    val respreadKeys = medians.collect {
      case (k, m) if m > 0.5 && spreadMap(k) > m => k
    }
    val isolatedMedians: Map[String, Double] = respreadKeys.map { k =>
      val fn = queries(k)
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // uncounted warmup
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
      val xs = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(100)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); TmpDirs.sweepRecorded()
        dt
      }
      k -> median(xs)
    }.toMap
    val respreadJson = respreadKeys.map { k =>
      "\"" + k + "\":{\"median\":" + medians.toMap.apply(k) +
        ",\"spread\":" + spreadMap(k) +
        ",\"isolated_median\":" + isolatedMedians(k) + "}"
    }.mkString("{", ",", "}")
    val effMedians = medians.map { case (k, v) => k -> isolatedMedians.getOrElse(k, v) }
    // Headline = MEDIAN of the per-pass totals (not sum-of-medians): the
    // median pass is a number that actually occurred, it is robust to one
    // noisy pass, and it is self-consistent with pass_totals by
    // construction. sum_of_medians is kept alongside for continuity with
    // rounds <= 6 (metric_version 2 = median-of-pass-totals headline,
    // introduced r7; compare rounds <= 6 via sum_of_medians).
    val passTotalSeq = perPass.map(p => ok.map(n => p(n).toOption.get).sum)
    val total = median(passTotalSeq)
    val sumOfMedians = medians.map(_._2).sum
    val passTotals = passTotalSeq.mkString("[", ",", "]")
    // stamp the measured tree (SURVEY §6.0: bench numbers must name the
    // commit they measured) — read from .git directly, no subprocess
    val gitHead: String = try {
      // resolve .git by walking up from the cwd so a bench launched from a
      // subdirectory still names its commit
      val gitDir = Iterator.iterate(java.nio.file.Paths.get(".").toAbsolutePath.normalize)(_.getParent)
        .takeWhile(_ != null).map(_.resolve(".git"))
        .find(java.nio.file.Files.isDirectory(_))
        .getOrElse(java.nio.file.Paths.get(".git"))
      val head = new String(java.nio.file.Files.readAllBytes(
        gitDir.resolve("HEAD"))).trim
      if (head.startsWith("ref: ")) {
        val ref = head.drop(5)
        val loose = gitDir.resolve(ref)
        if (java.nio.file.Files.exists(loose))
          new String(java.nio.file.Files.readAllBytes(loose)).trim.take(12)
        else {
          // after `git gc` the ref lives in packed-refs: "<sha> <refname>"
          val packed = gitDir.resolve("packed-refs")
          scala.io.Source.fromFile(packed.toFile).getLines()
            .filterNot(l => l.startsWith("#") || l.startsWith("^"))
            .map(_.split("\\s+", 2))
            .collectFirst { case Array(sha, name) if name == ref => sha.take(12) }
            .getOrElse("unknown")
        }
      } else head.take(12)
    } catch { case _: Throwable => "unknown" }
    // host-factor: control-key ratios vs the pinned fresh-host medians.
    // Emitted ONLY at the pinned scale (sfDir ends with sf0.1): at any
    // other sf a ratio conflates data scale with machine drift (ADVICE
    // r12). Scalar host_factor stays for cross-round continuity; the
    // per-family factors are what regression flagging divides by.
    val medMap = medians.toMap
    val atPinnedSf = sfDir.stripSuffix("/").endsWith(controlRefSfSuffix)
    val controlRatios =
      if (!atPinnedSf) Seq.empty
      else controlRef.toSeq.sortBy(_._1).flatMap { case (k, ref) =>
        medMap.get(k).map(m => k -> m / ref)
      }
    val hostFactor =
      if (controlRatios.isEmpty) "null"
      else median(controlRatios.map(_._2)).toString
    val controlsJson = controlRatios
      .map { case (k, r) => "\"" + k + "\":" + r }.mkString("{", ",", "}")
    val familyFactors: Map[String, Double] = controlRatios
      .groupBy { case (k, _) => controlFamily.getOrElse(k, "map") }
      .map { case (fam, rs) => fam -> median(rs.map(_._2)) }
    val familyJson = familyFactors.toSeq.sortBy(_._1)
      .map { case (f, v) => "\"" + f + "\":" + v }.mkString("{", ",", "}")
    // net-of-family regression flags vs a committed previous-round
    // baseline (BENCH_BASELINE.json or $SPARK_GRAFT_BENCH_BASELINE):
    // flag keys >1.5x their baseline median AFTER dividing by the KEY's
    // family factor, above a 0.5s floor — the §6.0 step-4 comparison,
    // emitted by the artifact itself so no judge rerun is needed.
    val baselinePath = sys.env.get("SPARK_GRAFT_BENCH_BASELINE")
      .map(java.nio.file.Paths.get(_))
      .orElse(Some(java.nio.file.Paths.get("BENCH_BASELINE.json")))
      .filter(p => java.nio.file.Files.exists(p))
    val baseline = baselinePath.map(parseBaseline).getOrElse(Map.empty)
    val effMap = effMedians.toMap
    val netRatios: Seq[(String, Double)] =
      if (baseline.isEmpty || !atPinnedSf) Seq.empty
      else effMedians.flatMap { case (k, cur) =>
        baseline.get(k).flatMap { base =>
          val fam = familyOf(k)
          familyFactors.get(fam).collect {
            case f if f > 0 && base > 0 => k -> (cur / base) / f
          }
        }
      }
    val netFlags = netRatios
      .filter { case (k, r) => r > 1.5 && effMap(k) > 0.5 }
      .sortBy(-_._2)
    val netFlagsJson = netFlags
      .map { case (k, r) => "\"" + k + "\":" + r }.mkString("{", ",", "}")
    val baselineJson = baselinePath.map(p => jstr(p.toString)).getOrElse("null")
    // cpu model: comparability evidence for cross-round artifacts
    val cpuModel: String = try {
      scala.io.Source.fromFile("/proc/cpuinfo").getLines()
        .collectFirst { case l if l.startsWith("model name") => l.split(":", 2)(1).trim }
        .getOrElse("unknown")
    } catch { case _: Throwable => "unknown" }
    val line =
      s"""{"metric":"total","metric_version":2,"value":$total,"unit":"sec","git_head":"$gitHead","queries":$qs,"sf":"$sfDir","passes":$nPasses,"pass_totals":$passTotals,"sum_of_medians":$sumOfMedians,"query_spread":$spread,"n_queries":${names.length},"n_failed":${erred.length},"errors":$errors,"host_factor":$hostFactor,"host_factor_ref":"$controlRefHead","control_ratios":$controlsJson,"host_factors":$familyJson,"baseline_file":$baselineJson,"net_flags":$netFlagsJson,"respread":$respreadJson,"cpu_model":${jstr(cpuModel)}}"""
    println(line)
    // stdout gets tail-captured and truncated by harnesses (the ~8KB full
    // line has never survived a capture intact): persist the full JSON to
    // files, and print the short summary line LAST so even a small tail
    // window ends with one complete, parseable JSON record. r14 lesson
    // (VERDICT "what's wrong" 1+2): the per-query file must be PER-RUN —
    // the driver benches at two core counts and the second run used to
    // overwrite the first's BENCH_FULL.json — and the summary must land in
    // a fixed file too, because sbt's log decoration made stdout
    // unparseable for two rounds (also fixed in build.sbt: StdoutOutput +
    // showSuccess=false so the summary really is the last bare line).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", s"BENCH_FULL_c$cpus.json")
    for (f <- Seq(outFile, "BENCH_FULL.json").distinct)
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(f), line + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] could not write $f: ${e.getMessage}") }
    val failedKeys = erred.map(jstr).mkString("[", ",", "]")
    val summary =
      s"""{"metric":"total","metric_version":2,"value":$total,"unit":"sec","sf":"$sfDir","cpus":$cpus,"passes":$nPasses,"pass_totals":$passTotals,"sum_of_medians":$sumOfMedians,"n_queries":${names.length},"n_failed":${erred.length},"failed_keys":$failedKeys,"host_factor":$hostFactor,"host_factors":$familyJson,"net_flags":$netFlagsJson,"respread":$respreadJson,"per_query_file":"$outFile"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SUMMARY.json"), summary + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write BENCH_SUMMARY.json: ${e.getMessage}") }
    spark.stop()
    // spark.stop() can emit shutdown warnings on stderr; the summary is
    // printed after it so the final STDOUT line is this one JSON record
    println(summary)
    System.out.flush()
    if (erred.nonEmpty) sys.exit(1)
  }
}
