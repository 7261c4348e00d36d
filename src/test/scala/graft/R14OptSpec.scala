package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R14 optimization-round equivalence pins: every fused imperative kernel
  * must be BIT-IDENTICAL to the compositional higher-order-function form
  * it replaced (the oracle hashes depend on it). Each test evaluates the
  * fused and compositional expressions side by side on the same frame —
  * real sf0.001 vectors plus adversarial synthetics (nulls, length
  * mismatches, zero norms) — and asserts row-for-row equality.
  */
class R14OptSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.functions.vexprs

  // ---- compositional reference forms (the pre-r14 implementations) ----
  private def dotQRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
  private def cosineQRef(a: Column, b: Column): Column = {
    val dot = dotQRef(a, b)
    val n2 = dotQRef(a, a) * dotQRef(b, b)
    when(n2 === 0L, lit(0.0)).otherwise(dot.cast("double") / sqrt(n2.cast("double")))
  }
  private def sqDistQRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
  private def l2DistsRef(r: Column, cb: Seq[Seq[Long]]): Column = {
    val cbLit = typedLit(cb)
    transform(sequence(lit(0), lit(cb.size - 1)), j =>
      aggregate(
        zip_with(r, element_at(cbLit, j + 1), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v))
  }

  /** Quantized testdata pairs: every (i, i+1) neighbour pair of the first
    * 200 sf0.001 embeddings, plus adversarial rows.
    */
  private lazy val pairFrame = {
    val q = Tables.embeddings(spark, dir).where(col("vec_id") < 200)
      .select(col("vec_id"), vec.Vec.quantize(col("embedding")).as("q"))
    val pairs = q.as("l").join(q.as("r"), col("l.vec_id") + 1 === col("r.vec_id"))
      .select(col("l.q").as("a"), col("r.q").as("b"))
    val edgeRows = Seq(
      ("array(1L, 2L, 3L)", "array(4L, 5L, 6L)"),
      ("array(0L, 0L)", "array(5L, 6L)"),                        // zero norm → 0.0
      ("array(1L, 2L)", "array(1L, 2L, 3L)"),                    // length mismatch → null
      ("array(0L, 0L)", "array(0L, 0L, 0L)"),                    // mismatch + zero → 0.0
      ("array(1L, cast(null as bigint), 3L)", "array(1L, 2L, 3L)"), // null element → null
      ("array()", "array()"),                                    // empty → 0.0
      ("cast(null as array<bigint>)", "array(1L, 2L)"))          // null array → null
    val edge = edgeRows.map { case (a, b) =>
      spark.range(1).select(
        expr(a).cast("array<bigint>").as("a"), expr(b).cast("array<bigint>").as("b"))
    }.reduce(_ unionByName _)
    pairs.unionByName(edge)
  }

  test("cosine_q ≡ aggregate(zip_with) compositional cosine, incl. edges") {
    val rows = pairFrame.select(
      vexprs.cosine_q(col("a"), col("b")).as("fused"),
      cosineQRef(col("a"), col("b")).as("ref")).collect()
    assert(rows.length > 150)
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"value mismatch: $r")
    }
  }

  test("dot_q and sq_dist_q ≡ their compositional forms, incl. edges") {
    val rows = pairFrame.select(
      vexprs.dot_q(col("a"), col("b")).as("df"),
      dotQRef(col("a"), col("b")).as("dr"),
      vexprs.sq_dist_q(col("a"), col("b")).as("sf"),
      sqDistQRef(col("a"), col("b")).as("sr")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"dot null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), s"dot mismatch: $r")
      assert(r.isNullAt(2) === r.isNullAt(3), s"sqdist null mismatch: $r")
      if (!r.isNullAt(2)) assert(r.getLong(2) === r.getLong(3), s"sqdist mismatch: $r")
    }
  }

  test("l2_dists_q ≡ compositional per-cell L2 through Rq.assign's reduction") {
    val cb: Seq[Seq[Long]] = Seq(Seq(0L, 0L, 0L), Seq(5L, -3L, 2L), Seq(100L, 100L, 100L))
    val rs = Seq(Seq(1L, 2L, 3L), Seq(0L, 0L, 0L), Seq(-50L, 40L, 7L)).toDF("r")
    val rows = rs.select(
      vexprs.l2_dists_q(col("r"), cb).as("fused"),
      l2DistsRef(col("r"), cb).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"l2 mismatch: $r")
    }
    // degenerate inputs reduce identically through array_min/array_position
    val bad = Seq(Seq[java.lang.Long](1L, 2L)).toDF("r") // length mismatch vs 3-wide cb
    val red = bad.select(
      (array_position(vexprs.l2_dists_q(col("r"), cb),
        array_min(vexprs.l2_dists_q(col("r"), cb))) - 1).as("cf"),
      (array_position(l2DistsRef(col("r"), cb),
        array_min(l2DistsRef(col("r"), cb))) - 1).as("cr")).head()
    assert(red.isNullAt(0) === red.isNullAt(1))
  }

  test("pq_encode / pq_min_dist_u6 ≡ compositional PQ sub-distance argmin") {
    import ann.Pq.{m, dsub, kCent}
    val emb = Tables.embeddings(spark, dir)
    val cb = ann.Pq.sampledCodebook(emb)
    // compositional reference, verbatim pre-r14 Pq.codes / distortion core
    val perS = (0 until m).map { s =>
      val sub = slice(col("embedding"), s * dsub + 1, dsub)
      val dists = array((0 until kCent).map { c =>
        aggregate(
          zip_with(sub, typedLit(cb(s)(c).toSeq),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, x) => a + x)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    val perSMin = (0 until m).map { s =>
      val sub = slice(col("embedding"), s * dsub + 1, dsub)
      val dists = array((0 until kCent).map { c =>
        aggregate(
          zip_with(sub, typedLit(cb(s)(c).toSeq),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, x) => a + x)
      }: _*)
      (array_min(dists) * 1e6).cast("long")
    }
    val cbSeq = cb.map(_.map(_.toSeq).toSeq).toSeq
    val rows = emb.select(
      vexprs.pq_encode(col("embedding"), cbSeq).as("cf"),
      array(perS: _*).as("cr"),
      vexprs.pq_min_dist_u6(col("embedding"), cbSeq).as("mf"),
      array(perSMin: _*).as("mr")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](0) === r.getSeq[Int](1), s"codes mismatch: $r")
      assert(r.getSeq[Long](2) === r.getSeq[Long](3), s"mindist mismatch: $r")
    }
  }

  test("adc_score ≡ compositional zip_with/element_at lut sum") {
    import ann.Pq.{m, kCent}
    val lut: Seq[Long] = Seq.tabulate(m * kCent)(i => (i * 37 - 1000).toLong)
    val lutLit = typedLit(lut)
    val codesDf = Seq(
      Seq(0, 1, 2, 3, 4, 5, 6, 7),
      Seq(15, 15, 15, 15, 15, 15, 15, 15),
      Seq(0, 0, 0, 0, 0, 0, 0, 0),
      Seq(1, 2, 3)). // wrong arity → null on both forms
      toDF("codes").select(col("codes").cast("array<int>").as("codes"))
    val ref = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (code, s) => element_at(lutLit, (s * kCent + code + 1).cast("int"))),
      lit(0L), (a, x) => a + x)
    val rows = codesDf.select(
      vexprs.adc_score(col("codes"), lut, kCent).as("f"), ref.as("r")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"adc null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), s"adc mismatch: $r")
    }
  }

  test("sketch_eq_count ≡ aggregate(zip_with(when)) slot compare") {
    val ref = aggregate(
      zip_with(col("a"), col("b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    val rows = Seq(
      ("array(1S, 2S, 3S)", "array(1S, 9S, 3S)"),
      ("array(1S, 2S)", "array(1S, 2S, 3S)"),                 // length mismatch → min-prefix count
      ("array(cast(null as smallint), 2S)", "array(1S, 2S)"), // null element contributes 0
      ("array()", "array()"),
      ("cast(null as array<smallint>)", "array(1S)"))         // null array → null
      .map { case (a, b) =>
        spark.range(1).select(
          expr(a).cast("array<smallint>").as("a"), expr(b).cast("array<smallint>").as("b"))
      }.reduce(_ unionByName _)
      .select(graft.functions.vexprs.sketch_eq_count(col("a"), col("b")).as("f"), ref.as("r"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"sketch null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getInt(0) === r.getInt(1), s"sketch mismatch: $r")
    }
  }

  test("fitMany ≡ sequential KMeans.fit per k (bit-identical centroids)") {
    val emb = Tables.embeddings(spark, dir)
    val ks = Seq(4, 16)
    val fused = ann.KMeans.fitMany(emb, ks, iters = 2)
    ks.foreach { k =>
      val seq = ann.KMeans.fit(emb, k, iters = 2)
      assert(fused(k).length === seq.length)
      fused(k).zip(seq).zipWithIndex.foreach { case ((f, s), c) =>
        assert(f.toSeq === s.toSeq, s"k=$k centroid $c differs")
      }
    }
  }

  test("fused Pq.fittedCodebook ≡ per-subspace sequential KMeans fit") {
    import ann.Pq.{m, dsub, kCent}
    val emb = Tables.embeddings(spark, dir)
    val fused = ann.Pq.fittedCodebook(emb)
    (0 until m).foreach { s =>
      val sub = emb.select(col("vec_id"),
        slice(col("embedding"), s * dsub + 1, dsub).as("embedding"))
      val seq = ann.KMeans.fit(sub, kCent, iters = 1)
      assert(fused(s).length === seq.length, s"subspace $s centroid count")
      fused(s).zip(seq).zipWithIndex.foreach { case ((f, r), c) =>
        assert(f.toSeq === r.toSeq, s"subspace $s centroid $c differs")
      }
    }
  }

  test("repsFromDocs over the full anchorDocs frame ≡ anchorReps(seeds.take(k))") {
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        functions.exprs.shingle_block(col("text"), 3).getField("sh").as("sh"))
    val docsAll = dedup.SetSim.anchorDocs(sets, maxTokenDf = 1000).persist()
    (1 to dedup.SetSim.AnchorSeeds.length).foreach { k =>
      val shared = dedup.SetSim.repsFromDocs(docsAll, tX1000 = 700, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val standalone = dedup.SetSim.anchorReps(
        sets, tX1000 = 700, maxTokenDf = 1000,
        seeds = dedup.SetSim.AnchorSeeds.take(k))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(shared === standalone, s"k=$k")
      spark.catalog.clearCache()
    }
    docsAll.unpersist()
  }

  test("restructured prefixJoinSets still finds EXACTLY the brute-force pairs") {
    // synthetic corpus with known near-dup structure: templates + edits
    val docs = Seq(
      (0L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)),
      (1L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 11L)), // J = 9/11 vs doc 0
      (2L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)), // exact dup of 0
      (3L, Seq(20L, 21L, 22L)),
      (4L, Seq(20L, 21L, 23L)),                            // J = 2/4 vs doc 3
      (5L, Seq(30L, 31L, 32L, 33L)),
      (6L, Seq[Long]()),                                   // empty → excluded
      (7L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 11L, 12L))) // J = 8/12 vs 0
      .toDF("doc_id", "sh")
    val got = dedup.SetSim.prefixJoinSets(docs, tX1000 = 700, maxTokenDf = 1000)
      .select("doc_a", "doc_b", "inter", "uni", "jacc_x1000")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // brute force over all pairs of df-filtered sets (df cap is a no-op here)
    val sets = Seq(
      0L -> Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L),
      1L -> Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 11L),
      2L -> Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L),
      3L -> Set(20L, 21L, 22L), 4L -> Set(20L, 21L, 23L),
      5L -> Set(30L, 31L, 32L, 33L),
      7L -> Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 11L, 12L))
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 1000 >= 700L * uni
    } yield (ia, ib, inter, uni, inter * 1000 / uni)).toSet
    assert(got === want)
    assert(want.exists(_._5 < 1000L), "fixture must include a non-exact pair")
  }

  test("restructured containJoinSets still finds EXACTLY the brute-force containments") {
    val docs = Seq(
      (0L, Seq(1L, 2L, 3L)),                                // contained in 1
      (1L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)),
      (2L, Seq(4L, 5L, 6L, 99L)),                           // 3/4 in doc 1
      (3L, Seq(50L, 51L)))
      .toDF("doc_id", "sh")
    val got = dedup.SetSim.containJoinSets(docs, tX1000 = 750, maxTokenDf = 1000)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "cont_x1000")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    val sets = Map(
      0L -> Set(1L, 2L, 3L), 1L -> Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L),
      2L -> Set(4L, 5L, 6L, 99L), 3L -> Set(50L, 51L))
    val want = (for {
      (ia, sa) <- sets.toSeq; (ib, sb) <- sets.toSeq if ia != ib
      inter = (sa & sb).size.toLong
      if inter * 1000 >= 750L * sa.size
    } yield (ia, ib, inter, sa.size.toLong, sb.size.toLong, inter * 1000 / sa.size)).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }
}
