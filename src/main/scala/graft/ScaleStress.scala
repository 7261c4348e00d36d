package graft

import org.apache.spark.sql.functions._

/** Scale-stress harness (dev main, not part of the driver contract):
  * synthesizes a ~`mult`× copy of the sf0.1 documents corpus into
  * TmpDirs scratch with PLANTED pathologies —
  *   - a 10k-copy viral segment (every doc_id % 5 == 0 doc starts with
  *     the same 40-word window → one hot LineDedup key, one hot LSH
  *     band bucket, 38 shared 3-shingles for SetSim's df cap),
  *   - a viral domain (every doc_id % 5 == 2 doc lands in source
  *     "src0" → pipe_domain_cap's TopKPerKey vs a 10k-doc domain),
  * then times the dedup family + incremental index + SetSim + line
  * dedup + domain cap at sf0.1 AND at the synthetic ~sf1, asserting
  * the skew guards hold at the larger scale (DedupSkewSpec-style) and
  * printing a per-op (base, big, ratio) table for SURVEY §5.
  *
  * A synthetic link graph with a 10k-degree viral hub stresses
  * Triangles' degree orientation the same way, at two edge scales.
  *
  * Usage: sbt "runMain graft.ScaleStress [mult] [baseDir]"
  */
object ScaleStress {

  def main(args: Array[String]): Unit = {
    val mult = args.lift(0).map(_.toInt).getOrElse(10)
    val baseDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    TmpDirs.sweepStale()
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    // NOT TmpDirs.create: the per-op sweepRecorded() below must not reap the
    // corpus mid-run. The graft_ prefix keeps it reclaimable by sweepStale.
    val scratch = s"/tmp/graft_stress_corpus_${System.nanoTime()}"
    new java.io.File(scratch).mkdirs()

    // ---- synthesize the big corpus ----
    val base = Tables.documents(spark, baseDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    // copies shift by max(doc_id)+1, NOT count(): sparse base ids would
    // make count()-shifted copies collide, corrupting the planted ratios
    val n = base.agg(max("doc_id")).head.getLong(0) + 1
    val nRows = base.count()
    val viralSeg = (1 to 40).map(i => s"graftviral$i").mkString(" ")
    val copies = (0 until mult).map { i =>
      base.select(
        (col("doc_id") + lit(i.toLong * n)).as("doc_id"),
        // per-copy word-level perturbation so copies are near-, not exact-, dups
        concat(col("text"), lit(s" copyset$i mark"), (col("doc_id") % 97).cast("string")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    val big = copies.reduce(_ unionByName _)
      .select(
        col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(lit(viralSeg + " "), col("text")))
          .otherwise(col("text")).as("text"),
        col("lang"),
        when(col("doc_id") % 5 === 2, lit("src0")).otherwise(col("source")).as("source"),
        col("n_chars"))
    big.write.mode("overwrite").parquet(s"$scratch/documents.parquet")
    val nBig = spark.read.parquet(s"$scratch/documents.parquet").count()
    println(s"[stress] corpus: base=$nRows docs, big=$nBig docs (${mult}x), scratch=$scratch")

    // ---- timed ops (documents-only query keys run verbatim on either dir) ----
    val ops = Seq(
      "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
      "dedup_ngram_reps", "dedup_setsim_prefix", "text_line_dedup",
      "pipe_domain_cap", "dedup_incremental",
      // R8 wave 3-5: (source,word)/word/gram-keyed profiles — the viral
      // segment concentrates one 40-word window's grams, the viral
      // domain concentrates src0's type table; both must stay combinable
      "text_hapax_ratio", "text_vocab_growth", "text_ngram_novelty",
      // R9 wave: the viral segment floods one chunk window's dims (RAG
      // dim-join stays broadcast), the viral domain skews the train
      // split's vocab (heldout/KL/coverage folds stay (source,word)- or
      // word-keyed and combinable)
      "pipe_rag_retrieval", "text_heldout_surprisal", "text_source_kl",
      "text_vocab_coverage",
      // R9 close wave: the viral segment repeats one CDC chunk 10k+
      // times (dup-mass join stays md5-keyed and combinable); BPE
      // encode's dictionary fit must stay vocab-bounded as the token
      // stream grows 10x
      "text_cdc_chunks", "text_bpe_encode",
      // R10 (r9-close wave): WFQ interleave — per-source weights stay a
      // broadcast aggregate, the head stays a TakeOrdered(100), and the
      // viral domain only changes src0's weight, never the plan shape
      "pipe_mix_interleave",
      // R10 wave: blocklist is one map-side IN-list scan; cooc's
      // rarest-10 blocking bounds pairs at 45·D; stitch's df cap must
      // suppress the viral head gram (10k docs share it); Neyman's
      // windows run on the |strata| frame; blur/audio decode per-doc
      // map-side; compaction rewrites the 10x bytes it is sized from.
      // (dedup_simhash_eval is NOT re-stressed: its truth leg is the
      // documented output-driven dedup_ngram_jaccard row.)
      "text_blocklist_filter", "text_cooc_graph", "text_stitch_candidates",
      "samp_neyman", "mm_blur_score", "mm_audio_match", "snk_compact",
      // R11 wave: JSD stays (source,word)-keyed with the same grain as
      // KL; systematic sampling's total-order rank is a range-partitioned
      // sort + zipWithIndex (no single-partition window); contrast
      // stretch is per-doc map-side decode
      "text_source_jsd", "samp_systematic", "mm_contrast_stretch",
      // R11 wave G: MoR read = two broadcast anti/semi joins against the
      // tiny DV; allocation eval runs on the |strata| frame
      "snk_merge_on_read", "samp_allocation_eval",
      // R12 wave: the HTML/crawl family is map-side regex chains + one
      // groupBy each; crawl pagerank joins the (≤1000-node, fixed-
      // modulus) link graph 3×; url dedup groups the URL space; mix
      // schedule/curriculum run on source/grid metadata after one pass
      "text_html_strip", "text_markup_audit", "pipe_html_gopher",
      "q_crawl_links", "q_crawl_pagerank", "dedup_url_canon",
      "pipe_mix_schedule", "pipe_curriculum_order",
      // video CAS = sampled-frame decode per doc (the audio posture);
      // robots gate = one raw-page substring probe + a groupBy
      "mm_video_match", "text_robots_gate",
      // winnow eval composes two proven capped legs; crawl khop BFS
      // runs on the fixed-modulus ≤1000-node core at any corpus size
      "dedup_winnow_eval", "q_crawl_khop",
      // R13 wave: setsim_reps is the O(n)-OUTPUT twin of the one
      // remaining output-driven >3x row (one row per doc, no pair
      // frame — the key this harness exists to prove); the BPE keys'
      // fit runs on the vocab²-bounded unit dictionary (same dict at
      // any corpus size) + one corpus groupBy; nested-strip/robots/
      // langid-script are map-side chains + bounded groupBys
      "dedup_setsim_reps", "text_bpe_vocab", "pipe_token_mix_bpe",
      "text_html_strip_nested", "text_robots_rules", "text_langid_script",
      // R14: the eval's truth leg (the pair-complete prefix join) runs
      // on the lowest-2000-doc_id cap — constant-cost at any corpus
      // size (was: inherited the output-driven 5x contract)
      "dedup_setsim_reps_eval",
      // frontier policy/politeness = map-side rules + one groupBy (+ the
      // broadcast dangling anti-join); fertility rides the
      // vocab²-bounded fit + one corpus explode/broadcast-join pass
      "q_crawl_frontier_policy", "text_bpe_fertility",
      "q_crawl_politeness",
      // sweep = 3 capped (truth, pred) leg pairs — capped-slice-bounded
      // like the eval
      "dedup_setsim_reps_sweep",
      // langroute = map-side classify + the proven Gopher passes + one
      // groupBy
      "pipe_quality_langroute")
    // dev iteration: SPARK_GRAFT_STRESS_OPS=a,b,c re-stresses only those
    // document ops. The doc-op SKEW GUARDS below still run — those are
    // never skippable — but the events/graph legs ARE skipped on a
    // filtered run (see the early return after the guards); only the
    // full unfiltered run, the one SURVEY §5 quotes, covers them.
    val opFilter = sys.env.get("SPARK_GRAFT_STRESS_OPS").map(_.split(',').toSet)
    val opsRun = opFilter.map(f => ops.filter(f)).getOrElse(ops)
    def time(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      TmpDirs.sweepRecorded()
      (dt, rows)
    }
    // untimed warmup: session init, codegen, parquet reader setup
    time("dedup_exact", baseDir)
    val results = opsRun.map { op =>
      val (tb, rb) = time(op, baseDir)
      val (tg, rg) = time(op, scratch)
      println(f"[stress] $op%-22s base ${tb}%6.1fs ($rb%7d rows)  big ${tg}%6.1fs ($rg%7d rows)  ratio ${tg / tb}%5.2f")
      (op, tb, tg, rb, rg)
    }

    // ---- skew-guard assertions at the larger scale ----
    // deliberately re-executed AFTER the timed loop (not folded into it):
    // assertion collects must never sit inside a timed window, and the
    // ~3s of duplicated work is irrelevant to a dev harness
    // 1. the 10k-copy viral segment survives segment dedup EXACTLY once
    val lineOut = SparkEntry.queries("text_line_dedup")(spark, scratch)
    val viralSurvivors = lineOut.where(col("kept_text").contains("graftviral1 ")).count()
    require(viralSurvivors == 1L,
      s"viral 40-word segment must survive exactly once, got $viralSurvivors")
    spark.catalog.clearCache(); TmpDirs.sweepRecorded()
    // 2. the ~10k-doc viral domain is capped at the query's n (5 per source)
    val capOut = SparkEntry.queries("pipe_domain_cap")(spark, scratch)
      .groupBy("source").count().collect()
    val viralDomain = capOut.filter(_.getString(0) == "src0").map(_.getLong(1)).headOption
    require(viralDomain.contains(5L),
      s"viral domain must cap at 5 docs, got $viralDomain")
    require(capOut.forall(_.getLong(1) <= 5L), "no domain may exceed the cap")
    spark.catalog.clearCache(); TmpDirs.sweepRecorded()

    if (opFilter.nonEmpty) {
      // dev iteration stops after the doc ops + skew guards; the full
      // (unfiltered) run — the one SURVEY §5 tables quote — always
      // continues through the events/graph legs below
      println("[stress] SPARK_GRAFT_STRESS_OPS set — skipping events/graph legs (dev run)")
      spark.stop()
      return
    }

    // ---- events: ~mult× corpus with a planted hot user ----
    // copies shift event_id/user_id into fresh ranges and nudge ts by i ns;
    // ~2% of ALL events collapse onto user_id 0 → one user holds ~2% of the
    // corpus (the viral-session shape window-free designs must survive)
    val rawEv = Tables.events(spark, baseDir)
    val uMax = rawEv.agg(max("user_id")).head.getLong(0) + 1
    val eMax = rawEv.agg(max("event_id")).head.getLong(0) + 1
    val passCols = rawEv.columns.filterNot(Set("ts", "ts_ns", "user_id", "event_id")).toSeq
    val evCopies = (0 until mult).map { i =>
      rawEv.select(
        (col("ts_ns") + lit(i.toLong)).as("ts") +:
          when(pmod(hash(col("event_id"), lit(i)), lit(50)) === 0, lit(0L))
            .otherwise(col("user_id") + lit(i.toLong * uMax)).as("user_id") +:
          (col("event_id") + lit(i.toLong * eMax)).as("event_id") +:
          passCols.map(col): _*)
    }
    evCopies.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$scratch/events.parquet")
    val nEvBig = spark.read.parquet(s"$scratch/events.parquet").count()
    val hotShare = Tables.events(spark, scratch).where(col("user_id") === 0L).count()
    println(s"[stress] events: big=$nEvBig rows, hot user holds $hotShare")
    val evOps = Seq(
      "q_events_session", "q_events_dedup_window", "q_events_rolling_distinct",
      "q_events_funnel", "q_events_transitions", "q_events_attribution",
      // R8 second wave: exact-bitmap retention, windowed feature gen,
      // conversion lag, path entropy, lateness audit — all must hold
      // their shape with the planted 2%-of-corpus hot user
      "q_events_bitmap_retention", "q_events_lag_features",
      "q_events_conversion_lag", "q_events_path_entropy",
      "q_events_lateness_audit",
      // R10 (r9-close wave): Kaplan-Meier — one (user) min/max aggregate
      // + a day-keyed risk-set fold; the hot user is one row after the
      // first aggregate
      "q_events_survival",
      // R10 wave: changepoint/MK run their pair/argmax terms on the
      // BOUNDED types×days metadata (the 10x corpus has the same day
      // domain → expected ~flat beyond the fact scan); HT estimate is
      // one fact pass + the per-week frame
      "q_events_changepoint", "q_trend_mann_kendall", "samp_ht_estimate",
      // R11 wave: rolling median + Holt-Winters both collapse to the
      // bounded (type×day)/(day) series before any window/fold — the
      // 10x corpus has the same day domain → expected ~flat beyond the
      // fact scan
      "q_events_rolling_median", "q_events_holt_winters",
      // R11 wave F: Hill folds user metadata, CUPED is one fact scan to
      // per-user sums + a 1-row pooled theta — the hot user is one row
      // after the first aggregate in both
      "q_users_hill_alpha", "q_events_cuped",
      // R11 wave H: reconciliation reads the bounded HW day series +
      // one type groupBy
      "q_events_forecast_reconcile")
    val evResults = evOps.map { op =>
      val (tb, rb) = time(op, baseDir)
      val (tg, rg) = time(op, scratch)
      println(f"[stress] $op%-26s base ${tb}%6.1fs ($rb%7d rows)  big ${tg}%6.1fs ($rg%7d rows)  ratio ${tg / tb}%5.2f")
      (op, tb, tg, rb, rg)
    }

    // ---- triangles: synthetic graph with a viral hub, two edge scales ----
    def graphEdges(nodes: Long, hubDeg: Long) = {
      val ring = spark.range(1, nodes)
        .select(least(col("id"), (col("id") + 1) % nodes).as("a"),
          greatest(col("id"), (col("id") + 1) % nodes).as("b"))
      val rand = spark.range(1, nodes)
        .select(col("id").as("a"), ((col("id") * 7919 + 13) % nodes).as("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      val hub = spark.range(1, hubDeg + 1).select(lit(0L).as("a"), col("id").as("b"))
      ring.unionByName(rand).unionByName(hub).where(col("a") =!= col("b")).distinct()
    }
    Seq(("base", 20000L), ("big", 200000L)).foreach { case (tag, nodes) =>
      val t0 = System.nanoTime()
      val tri = graph.Triangles.perNode(graphEdges(nodes, 10000L))
      val rows = tri.count()
      tri.unpersist(blocking = false)
      println(f"[stress] triangles_$tag%-13s nodes=$nodes%7d hub=10000: ${(System.nanoTime() - t0) / 1e9}%6.1fs ($rows rows)")
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
    }

    // ---- R10: label propagation + k-core on the same viral-hub graph ----
    // both are fixed-round edge⋈label / edge⋈degree equi-join loops; the
    // 10k-degree hub must cost its degree in aggregate rows, never a
    // window or a driver collect. Expected ~linear in |E| at 10x nodes.
    Seq(("base", 20000L), ("big", 200000L)).foreach { case (tag, nodes) =>
      val e = graphEdges(nodes, 10000L)
      val bidir = e.unionByName(e.select(col("b").as("a"), col("a").as("b"))).persist()
      val t0 = System.nanoTime()
      val lp = graph.LabelProp.communities(bidir, rounds = 3)
      val nComm = lp.select("lbl").distinct().count()
      lp.unpersist(blocking = false)
      val tLp = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
      val t1 = System.nanoTime()
      val core = graph.KCore.coreDegrees(e, k = 3, rounds = 3).count()
      val tCore = (System.nanoTime() - t1) / 1e9
      bidir.unpersist(blocking = false)
      println(f"[stress] labelprop/kcore_$tag%-5s nodes=$nodes%7d hub=10000: " +
        f"labelprop ${tLp}%5.1fs ($nComm communities)  kcore ${tCore}%5.1fs ($core core nodes)")
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
    }

    // ---- khop broadcast fallback on a planted HIGH-REACH graph ----
    // hub-of-hubs: seed 0 connects to 1..500, each of those to 500
    // more — the 2-hop reach is ~250k nodes. With broadcastLimit=100
    // the visited set outgrows the hint after round 1; Bfs must drop
    // the broadcast (usedBroadcast=false observed) and still produce
    // the identical hop histogram as the broadcast-everything run.
    {
      val l1 = spark.range(1, 501).select(lit(0L).as("a"), col("id").as("b"))
      val l2 = spark.range(1, 501).select(col("id").as("a"),
          explode(sequence(col("id") * 500 + 1000, col("id") * 500 + 1499)).as("b"))
      val e = l1.unionByName(l2)
      val bidir = e.unionByName(e.select(col("b").as("a"), col("a").as("b"))).persist()
      def hist(limit: Long, expectShuffleRounds: Boolean): Map[Long, Long] = {
        val rounds = scala.collection.mutable.ArrayBuffer[(Int, Long, Boolean)]()
        val v = graph.Bfs.khop(bidir, 0L, 3, limit, (h, n, b) => rounds += ((h, n, b)))
        val out = v.groupBy("hop").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        v.unpersist()
        if (expectShuffleRounds)
          require(rounds.exists(!_._3),
            s"planted reach must disengage the broadcast at limit=$limit, rounds=$rounds")
        else require(rounds.forall(_._3), s"default limit must broadcast, rounds=$rounds")
        out
      }
      val t0 = System.nanoTime()
      val viaShuffle = hist(100L, expectShuffleRounds = true)
      val tShuffle = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val viaBroadcast = hist(4000000L, expectShuffleRounds = false)
      val tBcast = (System.nanoTime() - t1) / 1e9
      require(viaShuffle == viaBroadcast,
        s"fallback path must match broadcast path: $viaShuffle vs $viaBroadcast")
      require(viaShuffle(2L) == 250000L, s"2-hop reach must be 250k, got $viaShuffle")
      println(f"[stress] khop_fallback     reach=${viaShuffle.values.sum}%7d nodes: " +
        f"shuffle-path ${tShuffle}%5.1fs == broadcast-path ${tBcast}%5.1fs (same histogram)")
      bidir.unpersist()
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
    }

    // ---- ANN probe path at two corpus scales ----
    // the production steady state: the PQ index is built once per corpus;
    // probes scan only the 16×-compressed codes. Measured at 1× and mult×
    // vectors (copies shift vec_id by max+1; fit init ids are preserved) —
    // probe time should scale ~linearly with the code table and never
    // shuffle the corpus.
    // carry the FULL table schema (label included): the synthesized
    // corpus must pass the same Tables.load schema check as real data
    val emb = Tables.embeddings(spark, baseDir).select("vec_id", "embedding", "label")
    val vMax = emb.agg(max("vec_id")).head.getLong(0) + 1
    (0 until mult).map { i =>
      emb.select((col("vec_id") + lit(i.toLong * vMax)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
    val qs = emb.where(col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val annTimes = Seq(("base", baseDir), ("big", scratch)).map { case (tag, d) =>
      val pqPath = s"$scratch/pqix_$tag"
      val tb0 = System.nanoTime()
      ann.Pq.Index.build(Tables.embeddings(spark, d), pqPath)
      val tBuild = (System.nanoTime() - tb0) / 1e9
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
      val tp0 = System.nanoTime()
      val rows = ann.Pq.Index.topK(spark, pqPath, qs, 10).count()
      val tProbe = (System.nanoTime() - tp0) / 1e9
      println(f"[stress] ann_pq_probe_$tag%-9s build=${tBuild}%5.1fs probe=${tProbe}%5.1fs ($rows rows)")
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
      (tag, tBuild, tProbe)
    }
    println(f"[stress] ann_pq probe ratio at ${mult}x vectors: ${annTimes(1)._3 / annTimes(0)._3}%.2f")

    // ---- R8 wave 4: embedding-keyed eval/pruning ops at mult× vectors ----
    // all three are one-corpus-scan designs (queries broadcast, k-means
    // assignment map-side) — expected ~linear, never a corpus shuffle
    // + R10 (r9-close wave): IVF cell-quality (k-means fit + one
    // assignment pass) and residual-quantization distortion (two nested
    // bounded codebook fits) — both one-corpus-scan, centroids as
    // driver metadata
    val embOps = Seq("samp_prototypes", "vec_hard_negatives", "vec_margin_eval",
      "ann_ivf_quality", "vec_rq_distortion",
      // R11 wave: SQ8 fit is one posexplode groupBy + broadcast scoring;
      // the embed-dedup eval's exact leg is slice-bounded BY CONTRACT
      // (vec_id < 500), so mult× vectors must not grow its pair count
      "vec_sq_recall", "dedup_embed_eval",
      // R11 wave G: three one-iteration fits (bounded k×d collects) +
      // one assignment scan each — expected ~linear in vectors
      "vec_kmeans_elbow")
    val embResults = embOps.map { op =>
      val (tb, rb) = time(op, baseDir)
      val (tg, rg) = time(op, scratch)
      println(f"[stress] $op%-22s base ${tb}%6.1fs ($rb%7d rows)  big ${tg}%6.1fs ($rg%7d rows)  ratio ${tg / tb}%5.2f")
      (op, tb, tg, rb, rg)
    }

    // ---- R10: record linkage at mult× customers ----
    // copies shift custkey into fresh ranges and nationkey by 25·i, so
    // blocking keys (nat, cents-bucket) stay copy-disjoint: the planted
    // dirty↔clean identities scale linearly, with no cross-copy
    // candidate blowup (duplicating names verbatim would be the
    // OUTPUT-driven quadratic, not an engine defect)
    val rawCust = Tables.customer(spark, baseDir)
    val cMax = rawCust.agg(max("c_custkey")).head.getLong(0) + 1
    val custPass = rawCust.columns.filterNot(Set("c_custkey", "c_nationkey")).toSeq
    (0 until mult).map { i =>
      rawCust.select(
        (col("c_custkey") + lit(i.toLong * cMax)).as("c_custkey") +:
          (col("c_nationkey") + lit(i * 25)).as("c_nationkey") +:
          custPass.map(col): _*)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scratch/customer.parquet")
    val linkResults = Seq("q_record_linkage", "q_linkage_eval").map { op =>
      val (tb, rb) = time(op, baseDir)
      val (tg, rg) = time(op, scratch)
      println(f"[stress] $op%-22s base ${tb}%6.1fs ($rb%7d rows)  big ${tg}%6.1fs ($rg%7d rows)  ratio ${tg / tb}%5.2f")
      (op, tb, tg, rb, rg)
    }

    // ---- R10 wave: mult× star schema (orders + lineitem copies, dims verbatim) ----
    // copies shift o_orderkey/l_orderkey into fresh ranges and KEEP
    // custkey/partkey/suppkey — order groups duplicate as disjoint keys,
    // so per-part/per-supplier masses scale exactly ×mult and the
    // adaptive thresholds (q_stock_value's 2×-mean, q_promo_parts' 50%
    // dominance) must select EXACTLY the base key sets — asserted below.
    val rawOrd = Tables.orders(spark, baseDir)
    val rawLi = Tables.lineitem(spark, baseDir)
    val oMax = rawOrd.agg(max("o_orderkey")).head.getLong(0) + 1
    val ordPass = rawOrd.columns.filterNot(_ == "o_orderkey").toSeq
    (0 until mult).map { i =>
      rawOrd.select((col("o_orderkey") + lit(i.toLong * oMax)).as("o_orderkey") +:
        ordPass.map(col): _*)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scratch/orders.parquet")
    val liPass = rawLi.columns.filterNot(_ == "l_orderkey").toSeq
    (0 until mult).map { i =>
      rawLi.select((col("l_orderkey") + lit(i.toLong * oMax)).as("l_orderkey") +:
        liPass.map(col): _*)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scratch/lineitem.parquet")
    Seq("nation", "supplier", "part", "region").foreach { t =>
      spark.read.parquet(s"$baseDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$scratch/$t.parquet")
    }
    val starOps = Seq(
      // benford: one digit scan + 9-group fold; dp histogram: 24-cell fold
      "q_values_benford", "q_dp_histogram",
      // Q11/Q20: broadcast-chain aggregates with adaptive thresholds
      "q_stock_value", "q_promo_parts",
      // PPR: copurchase artifact rebuilt at 10x fact rows (same part set
      // -> same edges, 10x derivation scan), 3 equi-join iterations
      "q_graph_ppr",
      // bucketed join: ingest-time shuffle amortization at 10x facts
      "snk_bucketed_join",
      // R11 wave: the stats battery collapses to bounded grids/series
      // before any window (day series, ≤50-value grid, month list,
      // price grid), the salt sweep's load grid is keys×f, the Bloom
      // eval probes mult× customers against a ≤4096-row bit set, the
      // triples stay per-basket C(m,3), closeness shares reach-dist's
      // one-frontier BFS
      "q_spearman_daily", "q_orders_runs_test", "q_mannwhitney_u",
      "q_weighted_median", "q_copurchase_triples", "q_join_skew_salt_sweep",
      "q_bloom_fpr_eval", "q_graph_closeness",
      // R11 wave H: conductance shares the build-once label chain (same
      // edges at 10x derivation scan); XYZ collapses to the (part,
      // month) grid
      "q_graph_conductance", "q_parts_xyz")
    val starResults = starOps.map { op =>
      val (tb, rb) = time(op, baseDir)
      val (tg, rg) = time(op, scratch)
      println(f"[stress] $op%-22s base ${tb}%6.1fs ($rb%7d rows)  big ${tg}%6.1fs ($rg%7d rows)  ratio ${tg / tb}%5.2f")
      (op, tb, tg, rb, rg)
    }
    // scale-invariance guards: ×mult masses leave the adaptive selections
    // and the digit distribution IDENTICAL to base
    val svBase = SparkEntry.queries("q_stock_value")(spark, baseDir).collect()
      .map(r => r.get(0).asInstanceOf[Number].longValue).toSet
    val svBig = SparkEntry.queries("q_stock_value")(spark, scratch).collect()
      .map(r => r.get(0).asInstanceOf[Number].longValue).toSet
    require(svBase == svBig, s"Q11 adaptive threshold drifted at ${mult}x: " +
      s"${(svBase -- svBig).size} lost, ${(svBig -- svBase).size} gained")
    spark.catalog.clearCache(); TmpDirs.sweepRecorded()
    val bfBase = SparkEntry.queries("q_values_benford")(spark, baseDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val bfBig = SparkEntry.queries("q_values_benford")(spark, scratch).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    require(bfBase == bfBig, s"Benford obs_pml must be copy-invariant: $bfBase vs $bfBig")
    spark.catalog.clearCache(); TmpDirs.sweepRecorded()

    // ---- R11: source-overlap at a 200-source corpus ----
    // the r10 watch item made a row: the pairs×masks product is sharded
    // by word pair, so 200 sources (4 mask words, 19,900 pairs) must pay
    // per-word-pair pattern joins, not 19,900 × full-pattern rows
    {
      val docsBase = Tables.documents(spark, baseDir).select("source", "text")
      val t0 = System.nanoTime()
      val rowsBase = pipeline.SourceOverlap.matrix(docsBase).count()
      val tb = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
      val docs200 = Tables.documents(spark, baseDir)
        .select(concat(lit("s"), lpad((col("doc_id") % 200).cast("string"), 3, "0")).as("source"),
          col("text"))
      val t1 = System.nanoTime()
      val rows200 = pipeline.SourceOverlap.matrix(docs200).count()
      val tw = (System.nanoTime() - t1) / 1e9
      require(rows200 == 200L * 199 / 2, s"expected 19900 source pairs, got $rows200")
      println(f"[stress] source_overlap      base(S~20) ${tb}%6.1fs ($rowsBase%7d rows)  " +
        f"S=200 ${tw}%6.1fs ($rows200%7d rows)  ratio ${tw / tb}%5.2f")
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
    }

    println("[stress] table for SURVEY (op | sf0.1 s | ~sf1 s | ratio at " + mult + "x data):")
    (results ++ evResults ++ embResults ++ linkResults ++ starResults).foreach { case (op, tb, tg, _, _) =>
      println(f"| $op | ${tb}%.1f | ${tg}%.1f | ${tg / tb}%.1f |")
    }
    println("[stress] all skew-guard assertions passed")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    ()
  }
}
