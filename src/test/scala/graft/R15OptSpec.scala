package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 optimization equivalence pins: every restructured operator is
  * compared against the compositional / per-leg form it replaced, on real
  * sf0.001 data plus adversarial edges. The optimizations must be
  * plan-shape changes only — outputs bit-identical.
  */
class R15OptSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.functions.vexprs

  private def cappedDocs: DataFrame =
    Tables.documents(spark, dir).where(col("doc_id") < 300)

  test("bandingSweepCandidates tagged single-pass ≡ per-config window/join/distinct legs") {
    val docs = cappedDocs
    val configs = Seq(8, 16, 32)
    val k = 128
    val maxBucketSize = 1000
    // verbatim pre-r15 per-config reference: one explode → (band,bh)
    // window cap → self-join → distinct per config, then union + sketch est
    val sigsAll = dedup.Dedup.signatures(docs, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = sigsAll.where(col("sig").isNotNull)
    val perConfig = configs.map { bands =>
      val rows = k / bands
      val banded = sigs
        .select(
          col("doc_id"),
          explode(
            transform(
              sequence(lit(0), lit(bands - 1)),
              j => struct(j.as("band"), xxhash64(j, slice(col("sig"), j * rows + 1, lit(rows))).as("bh"))))
            .as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      val bounded = banded
        .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "bh")))
        .where(col("bucket_n") <= maxBucketSize)
        .drop("bucket_n")
      bounded.as("l")
        .join(bounded.as("r"), Seq("band", "bh"))
        .where(col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
        .select(lit(bands.toLong).as("bands"), col("doc_a"), col("doc_b"))
    }
    val sketches = sigs.select(
      col("doc_id"),
      transform(col("sig"), x => (x.bitwiseAND(lit(0xffffL)) - lit(32768L)).cast("short")).as("sk"))
    val ref = perConfig.reduce(_ unionByName _)
      .join(sketches.select(col("doc_id").as("doc_a"), col("sk").as("sk_a")), "doc_a")
      .join(sketches.select(col("doc_id").as("doc_b"), col("sk").as("sk_b")), "doc_b")
      .withColumn("est_jaccard",
        vexprs.sketch_eq_count(col("sk_a"), col("sk_b")).cast("double") / k)
      .select("bands", "doc_a", "doc_b", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val fused = dedup.Dedup.bandingSweepCandidates(docs, configs, k, maxBucketSize)
    val got = fused
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    fused.unpersist()
    sigsAll.unpersist()
    assert(got.nonEmpty, "sweep produced no candidates — fixture too small")
    assert(got === ref)
  }

  test("repsSweepNonSelf ≡ per-k repsFromDocs non-self emissions, k = 1..3") {
    val sets = cappedDocs
      .select(col("doc_id"),
        functions.exprs.shingle_block(col("text"), 3).getField("sh").as("sh"))
    val docsAll = dedup.SetSim.anchorDocs(sets, maxTokenDf = 1000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docsAll.count()
    val kMax = dedup.SetSim.AnchorSeeds.length
    val sweep = dedup.SetSim.repsSweepNonSelf(docsAll, tX1000 = 700, kMax)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    (1 to kMax).foreach { k =>
      val ref = dedup.SetSim.repsFromDocs(docsAll, tX1000 = 700, k)
        .where(col("doc_id") =!= col("rep_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      val got = sweep.filter(_._1 == k.toLong).map(t => (t._2, t._3, t._4))
        .sortBy(t => (t._1, t._2))
      assert(got === ref, s"k=$k emission mismatch")
    }
    // the sweep must actually exercise non-self reps on this fixture
    assert(sweep.nonEmpty, "no non-self reps — fixture too small")
    docsAll.unpersist()
  }

  test("pq_min_dist_u6: all-NaN subspace matches the compositional cast (0L), ADVICE r14") {
    import ann.Pq.{m, dsub, kCent}
    val cb: Seq[Seq[Seq[Double]]] =
      Seq.tabulate(m, kCent, dsub)((s, c, j) => (s + c + j).toDouble)
    // one row whose every element is NaN, one mixed row (first subspace NaN)
    val nanVec = Seq.fill(m * dsub)(Float.NaN)
    val mixedVec = Seq.tabulate(m * dsub)(i => if (i < dsub) Float.NaN else i.toFloat)
    val df = Seq(nanVec, mixedVec).toDF("embedding")
    val perSMin = (0 until m).map { s =>
      val sub = slice(col("embedding"), s * dsub + 1, dsub)
      val dists = array((0 until kCent).map { c =>
        aggregate(
          zip_with(sub, typedLit(cb(s)(c)),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, x) => a + x)
      }: _*)
      (array_min(dists) * 1e6).cast("long")
    }
    // ANSI (Spark 4 default) makes cast(NaN as long) THROW, so the
    // pre-r14 compositional form never had observable NaN output on the
    // ANSI path; the fused kernel pins the LEGACY cast semantics (NaN →
    // 0L) per ADVICE r14 — evaluate the reference leg under that mode
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    val rows =
      try {
        spark.conf.set("spark.sql.ansi.enabled", "false")
        df.select(
          vexprs.pq_min_dist_u6(col("embedding"), cb).as("f"),
          array(perSMin: _*).as("r")).collect()
      } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"NaN mindist mismatch: $r")
    }
    // and the all-NaN subspace really is 0L, not a MaxValue sentinel
    assert(rows(0).getSeq[Long](0).forall(_ == 0L))
    assert(rows(1).getSeq[Long](0).head == 0L)
  }

  test("khopLayers layer counts ≡ khop hop histogram; layered multi ≡ khopMulti union") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey").distinct()
    val e = li.as("x").join(li.as("y"), Seq("l_orderkey"))
      .where(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b")).distinct()
    val bidir = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("b")).persist()
    val seeds = bidir.groupBy("b").agg(count(lit(1)).as("deg"))
      .orderBy(desc("deg"), col("b")).limit(2).collect().map(_.getLong(0)).toSeq
    // single-seed: per-layer counts are the hop histogram
    val v = graph.Bfs.khop(bidir, seeds.head, hops = 3)
    val hist = v.groupBy("hop").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    v.unpersist()
    val layers = graph.Bfs.khopLayers(bidir, seeds.head, hops = 3)
    val layerHist = layers.zipWithIndex
      .collect { case ((_, n), h) if n > 0 => h.toLong -> n }.toMap
    layers.foreach(_._1.unpersist())
    assert(layerHist === hist)
    // multi-seed: lazy union of layers ≡ the khopMulti union frame
    val m = graph.Bfs.khopMulti(bidir, seeds, hops = 3)
    val want = m.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    m.unpersist()
    val mLayers = graph.Bfs.khopMultiLayers(bidir, seeds, hops = 3)
    val got = mLayers.map(_._1).reduce(_ unionByName _)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    mLayers.foreach(_._1.unpersist())
    bidir.unpersist()
    assert(got === want)
  }

  test("sign_pack fused kernel ≡ compositional sequence/element_at aggregates") {
    // real embeddings plus adversarial rows: null elements, negatives,
    // zeros, and a short (<64-dim) vector
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .withColumn("q", vec.Vec.quantize(col("embedding"))).select("vec_id", "q")
      .unionByName(Seq(
        (900001L, Seq[java.lang.Long](1L, null, -3L, 0L, 5L)),
        (900002L, Seq.tabulate[java.lang.Long](70)(i => java.lang.Long.valueOf(if (i % 3 == 0) i + 1 else -1)))
      ).toDF("vec_id", "q"))
    val ref = emb.select(col("vec_id"),
      expr("aggregate(transform(sequence(0, 63), " +
        "i -> IF(element_at(q, i + 1) > 0L, shiftleft(1L, i), 0L)), " +
        "0L, (a, x) -> a | x)").as("bits"),
      expr("CAST(aggregate(q, 0, (a, x) -> a + IF(x > 0L, 1, 0)) AS BIGINT)").as("n_pos"))
      // the 5-element row would make ANSI element_at(q, 6..64) throw in
      // the reference; the fused kernel pins the legacy 0-bit semantics
      .where(size(col("q")) >= 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val gotAll = emb.select(col("vec_id"),
      graft.functions.vexprs.sign_pack(col("q")).as("sp"))
      .select(col("vec_id"), col("sp.bits"), col("sp.n_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val got = gotAll.filter(t => t._1 < 900001L || t._1 == 900002L)
    assert(got === ref)
    // the short row: bits over present elements only, n_pos counts all
    val shortRow = gotAll.find(_._1 == 900001L).get
    assert(shortRow._2 === ((1L << 0) | (1L << 4)))
    assert(shortRow._3 === 2L)
  }

  test("anchorPrefixDocs shared aggregate ≡ independent prefixJoinSets + anchorReps legs") {
    val sets = cappedDocs
      .select(col("doc_id"),
        functions.exprs.shingle_block(col("text"), 3).getField("sh").as("sh"))
    val kAll = dedup.SetSim.AnchorSeeds.length
    val docsAll = dedup.SetSim.anchorPrefixDocs(sets, maxTokenDf = 1000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docsAll.count()
    // truth leg off the shared frame ≡ the standalone pair-complete op
    val truthRef = dedup.SetSim.prefixJoinSets(sets, tX1000 = 700, maxTokenDf = 1000)
    val tWant = truthRef.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
    truthRef.unpersist()
    val tGot = dedup.SetSim.prefixPairsFromDocs(docsAll, tX1000 = 700).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(tGot === tWant)
    assert(tGot.nonEmpty, "truth leg empty — fixture too small")
    // pred leg off the shared frame ≡ the standalone anchorReps
    val predRef = dedup.SetSim.anchorReps(sets, tX1000 = 700, maxTokenDf = 1000)
    val pWant = predRef.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val pGot = dedup.SetSim.repsFromDocs(
        dedup.SetSim.repsFsh(docsAll, kAll), tX1000 = 700, kAll).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    docsAll.unpersist()
    assert(pGot === pWant)
    assert(pGot.exists(t => t._1 != t._2), "no non-self reps — fixture too small")
  }

  test("Hits.runLocal / PageRank.runLocal ≡ distributed run, incl. no-in-edge nodes") {
    // planted directed weighted graph with a source-only node (10), a
    // sink-only node (40), and a heavy weight that exercises the wide
    // product path
    val es = Seq(
      (10L, 20L, 3L), (20L, 30L, 1000000L), (30L, 20L, 2L),
      (20L, 40L, 7L), (30L, 40L, 1L))
    val e = es.toDF("src", "dst", "cnt")
    val ref = graph.Hits.run(e, iters = 3)
    val want = ref.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    ref.unpersist()
    val got = graph.Hits.runLocal(e, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === want)
    val pe = e.select("src", "dst")
    val pRef = graph.PageRank.run(pe, iters = 3)
    val pWant = pRef.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    pRef.unpersist()
    val pGot = graph.PageRank.runLocal(pe, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pGot === pWant)
    // and on the real (dimension-bounded) nation-trade shape at sf0.001:
    // distinct customer→supplier nation pairs with lineitem counts
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val su = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val tr = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    val hRef = graph.Hits.run(tr, iters = 3)
    val hWant = hRef.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    hRef.unpersist()
    val hGot = graph.Hits.runLocal(tr, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(hGot === hWant)
    // the bound refuses data-scale graphs instead of collecting them
    intercept[IllegalArgumentException] {
      graph.PageRank.runLocal(pe, iters = 1, maxEdges = 2)
    }
  }

  test("prefixJoinSets / containJoinSets reject out-of-range permille thresholds (ADVICE r14)") {
    val sets = cappedDocs.select(col("doc_id"),
      array_distinct(text.Text.hashedArray(text.Text.words(col("text")))).as("sh"))
    intercept[IllegalArgumentException] {
      dedup.SetSim.prefixJoinSets(sets, tX1000 = 1200, maxTokenDf = 1000)
    }
    intercept[IllegalArgumentException] {
      dedup.SetSim.containJoinSets(sets, tX1000 = -1, maxTokenDf = 1000)
    }
  }
}
