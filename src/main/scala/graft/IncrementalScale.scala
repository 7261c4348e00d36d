package graft

import org.apache.spark.sql.functions._

/** Incremental-index scale harness (dev main, not part of the driver
  * contract): the 100 TB story's strongest evidence is the persisted
  * dedup index absorbing a FIXED delta while the history grows 1× →
  * 10× → 100× (~5k → ~500k docs from the sf0.1 corpus). For each
  * scale it
  *   - synthesizes the history (near-dup copy sets, with a planted
  *     viral 40-word segment on every doc_id % 5 == 0 doc — a shared-
  *     prefix family 100k strong at 100×; note a shared PREFIX does
  *     not concentrate into one LSH bucket, since a band bucket needs
  *     all 8 of its minhash slots drawn from the shared words — the
  *     probe below checks the family cannot distort classification
  *     either way; whole-doc boilerplate collapse is the bucket cap's
  *     job, exercised by DedupSkewSpec/ScaleStress),
  *   - builds the index (timed; row counts recorded),
  *   - runs ONE classify+absorb of the same 2,100-doc delta (timed):
  *     700 exact copies of history docs, 700 near-dups (small tail
  *     edit), 600 novel word-salad docs, 100 viral-prefixed novels
  *     (viral head, novel tail — must classify novel, not explode),
  * then asserts
  *   - verdict counts are IDENTICAL at every scale (classification
  *     depends on relevant content, not corpus size),
  *   - every viral-prefixed probe stays `novel` at every scale,
  *   - the classify plan at the largest scale has no sort-merge join —
  *     the batch side broadcasts in all three tiers, the index only
  *     ever streams map-side,
  *   - per-delta time at 100× stays within 4× of 1× (the honest cost
  *     model is O(delta) shuffle work + one map-side streaming
  *     read-through of the index segments; no index-side shuffle),
  * and prints an (index size vs per-delta seconds) table for SURVEY §5.
  *
  * Usage: sbt "runMain graft.IncrementalScale [baseDir] [mults]"
  */
object IncrementalScale {

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).map(_.split(',').map(_.toInt).toSeq).getOrElse(Seq(1, 10, 100))
    TmpDirs.sweepStale()
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val scratch = s"/tmp/graft_incscale_${System.nanoTime()}"
    new java.io.File(scratch).mkdirs()

    val base = Tables.documents(spark, baseDir).select("doc_id", "text")
    val n = base.agg(max("doc_id")).head.getLong(0) + 1
    val viralSeg = (1 to 40).map(i => s"graftviral$i").mkString(" ")

    // history at `mult`: near-dup copy sets (tail-perturbed), viral
    // segment planted on doc_id % 5 == 0 — same shapes as ScaleStress
    def history(mult: Int) = (0 until mult)
      .map { i =>
        base.select(
          (col("doc_id") + lit(i.toLong * n)).as("doc_id"),
          concat(col("text"), lit(s" copyset$i mark"), (col("doc_id") % 97).cast("string")).as("text"))
      }
      .reduce(_ unionByName _)
      .select(
        col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(lit(viralSeg + " "), col("text")))
          .otherwise(col("text")).as("text"))

    // the FIXED delta (identical content at every scale; fresh ids at
    // 1000n): exact/near tiers derive from the i=0 copy set — present
    // verbatim in every history — novel tiers are deterministic salads
    def salad(mul: Long) = array_join(
      transform(sequence(lit(0), lit(60)),
        i => concat(lit("nvw"), ((col("doc_id") * mul + i.cast("long") * 17L) % 100000L).cast("string"))),
      " ")
    def delta(hist0: org.apache.spark.sql.DataFrame) = {
      val fresh = (col("doc_id") + lit(1000L * n)).as("doc_id")
      val exactD = hist0.where(col("doc_id") < 700).select(fresh, col("text"))
      val nearD = hist0.where(col("doc_id") >= 700 && col("doc_id") < 1400)
        .select(fresh, concat(col("text"), lit(" deltaedit "), (col("doc_id") % 13).cast("string")).as("text"))
      val novelD = base.where(col("doc_id") >= 1400 && col("doc_id") < 2000)
        .select(fresh, salad(131L).as("text"))
      val viralD = base.where(col("doc_id") >= 2000 && col("doc_id") < 2100)
        .select(fresh, concat(lit(viralSeg + " "), salad(257L)).as("text"))
      exactD.unionByName(nearD).unionByName(novelD).unionByName(viralD)
    }

    var counts1x: Map[String, Long] = null
    val rows = mults.map { mult =>
      val histDir = s"$scratch/hist_$mult"
      val ixDir = s"$scratch/ix_$mult"
      history(mult).write.mode("overwrite").parquet(histDir)
      val hist = spark.read.parquet(histDir)
      val nHist = hist.count()

      val t0 = System.nanoTime()
      dedup.Incremental.buildIndex(hist, ixDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      def ixRows(part: String) = spark.read.parquet(s"$ixDir/$part").count()
      val (nBands, nSk) = (ixRows("bands"), ixRows("sketches"))

      val deltaDf = delta(hist.where(col("doc_id") < n)).localCheckpoint(true)
      val nDelta = deltaDf.count()
      val t1 = System.nanoTime()
      val verdicts = dedup.Incremental.classifyAndAbsorb(deltaDf, ixDir)
      val tDelta = (System.nanoTime() - t1) / 1e9

      val byVerdict = verdicts.groupBy("verdict").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // skew probe: every viral-prefixed doc must classify novel — the
      // capped band buckets keep the viral head from matching anything
      val viralVerdicts = verdicts.where(col("doc_id") >= 1000L * n + 2000)
        .groupBy("verdict").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(viralVerdicts == Map("novel" -> 100L),
        s"${mult}x: viral probes must all be novel, got $viralVerdicts")
      // scale invariance: same delta, same verdicts, at every history size
      if (counts1x == null) counts1x = byVerdict
      require(byVerdict == counts1x,
        s"${mult}x: verdict counts $byVerdict differ from 1x $counts1x")
      val plan = verdicts.queryExecution.executedPlan.toString
      require(!plan.contains("SortMergeJoin"),
        s"${mult}x: classify plan must not sort-merge join (index side must stream):\n$plan")
      verdicts.unpersist(blocking = false)
      deltaDf.unpersist(blocking = false)
      spark.catalog.clearCache(); TmpDirs.sweepRecorded()
      println(f"[incscale] ${mult}%3dx hist=$nHist%7d bands=$nBands%8d sketches=$nSk%7d " +
        f"build=${tBuild}%6.1fs delta($nDelta)=${tDelta}%5.1fs verdicts=$byVerdict")
      (mult, nHist, nBands, nSk, tBuild, tDelta)
    }

    val t1x = rows.head._6
    val tMax = rows.last._6
    println("[incscale] table for SURVEY (mult | history docs | bands rows | sketches rows | build s | per-delta s):")
    rows.foreach { case (m, h, b, sk, tb, td) =>
      println(f"| ${m}x | $h | $b | $sk | ${tb}%.1f | ${td}%.1f |")
    }
    require(tMax <= t1x * 4,
      f"per-delta time must stay near-flat: 1x=${t1x}%.1fs vs ${rows.last._1}x=${tMax}%.1fs")
    println(f"[incscale] per-delta ratio ${rows.last._1}x/1x = ${tMax / t1x}%.2f — all assertions passed")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    ()
  }
}
