package graft.dedup

import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Prefix-filter set-similarity self-join — the AllPairs/PPJoin family
  * (public construction: Bayardo et al. "Scaling Up All Pairs Similarity
  * Search", Xiao et al. PPJoin), complementing the LSH dedup paths with
  * an EXACT-threshold Jaccard join that still never goes O(n²).
  *
  * The filter: order each document's distinct tokens globally
  * rarest-first (ascending document frequency). Two token sets with
  * Jaccard >= t MUST share at least one token among each side's first
  * `p = n - ceil(t·n) + 1` tokens in that order — so only documents
  * sharing a PREFIX token ever become a candidate pair, and prefix
  * tokens are by construction the RARE ones.
  *
  * Viral-token guard: tokens with document frequency > `maxTokenDf` are
  * excluded from the similarity universe entirely (boilerplate shingles
  * carry no near-dup signal — the same rationale as the LSH bucket cap,
  * Dedup.minhashCandidates). Unlike a bucket-size cap, a df threshold
  * is independent of any tie-break ordering, so the operator's output —
  * exact Jaccard over the df-filtered sets — is reproducible across
  * engines and cluster sizes bit-for-bit. The prefix-filter theorem
  * holds under ANY fixed total order, so the candidate step never drops
  * a qualifying pair regardless of how df ties are broken.
  *
  * 100 TB shape:
  *  - per-doc sets: one map-side pass (hashed set elements — 64-bit
  *    xxhash64, ~1e-15 collision odds per pair, same trade as
  *    Dedup.ngramJaccard).
  *  - document frequency: one groupBy(token) with map-side partials.
  *  - rarest-first ranking: a row_number window partitioned by doc_id —
  *    partition size is bounded by tokens-per-document, never corpus-
  *    shaped, so there is no hot-key hazard; the filtered set size
  *    rides the same window shuffle as a count(*) frame.
  *  - candidate generation: equi-join on prefix tokens only; bucket
  *    sizes are bounded by maxTokenDf.
  *  - verify: exact |A∩B| via array_intersect of the two (map-side
  *    rebuilt) filtered sets; cost is candidates × set size.
  *
  * All output arithmetic is integer (threshold compared by
  * cross-multiplication, similarity in exact permille), so the DuckDB
  * oracle hash-matches bit-for-bit.
  */
object SetSim {

  /** Pairs (doc_a < doc_b) with exact Jaccard >= tX1000/1000 over the
    * df-filtered element sets. `sets` is (doc_id, sh: array<long>) with
    * distinct elements per row. Returns (doc_a, doc_b, inter, uni,
    * jacc_x1000); caller owns the returned persisted frame's lifecycle.
    */
  def prefixJoinSets(
      sets: DataFrame,
      tX1000: Int,
      maxTokenDf: Int): DataFrame = {
    // r15 (ADVICE r14): tX1000 > 1000 would make the slice length
    // n - ceil(t·n) + 1 negative — a runtime 'unexpected value for
    // length' error where the old row_number window silently returned an
    // empty prefix. A permille threshold outside [0, 1000] is a caller
    // bug; fail at entry with a clear message.
    require(tX1000 >= 0 && tX1000 <= 1000,
      s"tX1000 must be a permille threshold in [0, 1000], got $tX1000")
    // (doc_id, token) element relation; persisted — feeds the df
    // aggregate and the df-attach join.
    val toks = sets
      .where(col("sh").isNotNull && size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("token"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val dfq = toks.groupBy("token").agg(count(lit(1)).as("df"))

    // Similarity universe = non-viral tokens only (df-deterministic cap).
    val eligible = toks.join(dfq, "token").where(col("df") <= maxTokenDf)

    // r14 (guide §2.4): ONE doc_id aggregate replaces the rarity
    // row_number window + the separate filtered-set groupBy — the old
    // shape attached df and shuffled the full element relation by doc_id
    // TWICE (window pass + rebuild pass). `rar` is the per-doc element
    // list sorted (df, token) — exactly the window's rarest-first order,
    // ties on df broken by token value (any fixed total order satisfies
    // the prefix-filter completeness theorem); the prefix is its first
    // n - ceil(t·n) + 1 entries, and the verify set is the same list
    // re-sorted by token. Partition size stays bounded by
    // tokens-per-document, never corpus-shaped. Pair set is bit-identical
    // (R14OptSpec pins window-vs-slice prefix equality).
    val docAgg = eligible
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("rar"),
        count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val out = prefixPairsFromDocs(docAgg, tX1000).persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    toks.unpersist(blocking = false)
    docAgg.unpersist(blocking = false)
    out
  }

  /** The candidate+verify tail of [[prefixJoinSets]] over a (possibly
    * wider — extra columns are ignored) doc aggregate carrying `rar`
    * (the per-doc (df, token)-sorted element structs) and `n` — exposed
    * (r15) so the eval/sweep keys share ONE corpus aggregate between
    * the pair-complete truth leg and the anchor-reps pred leg (see
    * [[anchorPrefixDocs]]). Lazy; callers persist/materialize.
    */
  def prefixPairsFromDocs(docAgg: DataFrame, tX1000: Int): DataFrame = {
    require(tX1000 >= 0 && tX1000 <= 1000,
      s"tX1000 must be a permille threshold in [0, 1000], got $tX1000")
    val prefix = docAgg.select(col("doc_id"),
      explode(expr(
        s"transform(slice(rar, 1, cast(n - ($tX1000 * n + 999) div 1000 + 1 as int)), x -> x.token)"))
        .as("token"))

    val cand = prefix.as("l")
      .join(prefix.as("r"), Seq("token"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()

    // Filtered sets read back off the same aggregate (sorted for
    // determinism), then exact |A∩B| via map-side array_intersect.
    val fsets = docAgg.select(col("doc_id"),
      sort_array(expr("transform(rar, x -> x.token)")).as("fsh"), col("n"))
    cand
      .join(fsets.select(col("doc_id").as("doc_a"), col("fsh").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(fsets.select(col("doc_id").as("doc_b"), col("fsh").as("sh_b"), col("n").as("n_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * 1000 >= lit(tX1000.toLong) * col("uni"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        expr("inter * 1000 div uni").as("jacc_x1000"))
  }

  /** ONE doc aggregate serving BOTH set-similarity legs (r15, guide
    * §1.2 step 1): the per-doc (df, token)-sorted element list `rar`
    * ([[prefixPairsFromDocs]]'s input) AND the k anchor block keys
    * bk0..bk_{k-1} ([[repsFromDocs]]'s input), over the same eligible
    * (df ≤ maxTokenDf) element relation. The eval and sweep keys ran
    * the token explode + df aggregate + doc aggregate TWICE — once per
    * leg — for quantities that ride one exchange. [[repsFsh]] derives
    * the `fsh` column [[repsFromDocs]] expects map-side from `rar`
    * (same multiset, same sorted order — R15OptSpec pins both legs
    * against the independent operators). Caller owns persistence.
    */
  def anchorPrefixDocs(
      sets: DataFrame,
      maxTokenDf: Int,
      seeds: Seq[Long] = AnchorSeeds): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val toks = sets
      .where(col("sh").isNotNull && size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("token"))
    val dfq = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val eligible = toks.join(dfq, "token").where(col("df") <= maxTokenDf)
    def mixed(seed: Long): Column = ColumnBridge.column(
      graft.functions.Mix64Long(
        ColumnBridge.expression(col("token").bitwiseXOR(lit(seed)))))
    val aggs = seeds.zipWithIndex.map { case (sd, i) => min(mixed(sd)).as(s"bk$i") } ++
      Seq(sort_array(collect_list(struct(col("df"), col("token")))).as("rar"),
        count(lit(1)).as("n"))
    eligible.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Projection adapting an [[anchorPrefixDocs]] frame to the
    * (doc_id, bk*, fsh, n) shape [[repsFromDocs]]/[[repsSweepNonSelf]]
    * consume: fsh = the token-sorted element array, derived map-side
    * from `rar`.
    */
  def repsFsh(docs: DataFrame, k: Int): DataFrame =
    docs.select(Seq(col("doc_id")) ++
      (0 until k).map(i => col(s"bk$i")) ++
      Seq(sort_array(expr("transform(rar, x -> x.token)")).as("fsh"), col("n")): _*)

  /** O(n)-OUTPUT anchor-representative twin of [[prefixJoinSets]] — the
    * 100 TB emission contract for boilerplate-heavy corpora (the
    * `dedup_ngram_reps` trick applied to the set-similarity family): the
    * all-pairs mode is quadratic in duplicate-group size (a 10k-copy
    * viral block emits ~50M qualifying pairs; this emits 10k rows).
    *
    * Block keys = the doc's MINIMUM eligible token under k independent
    * hash permutations (Mix64 of token XOR seed_i) — MULTI-anchor
    * min-hash anchoring (Broder's min-wise independence: two sets share
    * their minimum under one random hash order with probability exactly
    * their Jaccard; k independent orders lift pair recall to
    * ≈ 1−(1−J)^k, r13 verdict task #1). Exact duplicates ALWAYS share
    * every block. A rarest-token key was tried first and rejected: a
    * near-dup's edit introduces a globally-UNIQUE shingle which becomes
    * its rarest token, so non-exact dups essentially never shared their
    * anchor's block (recall ~0 by construction, not by chance).
    *
    * Each block's anchor is its min doc_id; every doc collects its ≤k
    * candidate anchors, Jaccard-verifies each NON-SELF candidate, and
    * emits exactly one row (doc_id, rep_id, jacc_x1000): rep_id = the
    * best non-self candidate (highest exact df-filtered Jaccard, ties
    * to lowest anchor_id) when it clears the threshold, else the doc
    * itself; jacc_x1000 = the Jaccard to that best candidate (1000 for
    * a doc with no non-self candidate — its rep is itself). Self
    * candidates MUST be excluded before the best-of window: a doc that
    * anchors any one of its k blocks would otherwise be its own
    * candidate at Jaccard 1000 and SHADOW every true near-dup anchor
    * from the other seeds — exactly inverting the multi-anchor recall
    * lift (caught by the planted-collapse spec, R13OperatorLawsSpec).
    * Still a RECALL-TRADED contract (an unrelated lower-id block anchor
    * can shadow a true near-dup in all k blocks) — the certified
    * pair-complete operator stays available; this is the
    * emission-bounded production mode, and `dedup_setsim_reps_eval`
    * publishes the measured recall.
    *
    * Shapes: one groupBy(token) for df, one doc_id groupBy for per-doc
    * (k block keys, filtered set, size) — all k mins and collect_list
    * ride the same exchange — ONE (seed, bk)-tagged groupBy for all k
    * anchor spaces + one tagged join + distinct over ≤k·n candidate
    * rows, two set-attach joins, one map-side array_intersect per
    * candidate, one ≤k-row-per-doc window (arrays projected away
    * first), one left join for the self-fallback emission. No
    * candidate pair frame exists at
    * all. Docs with zero eligible tokens (all-viral or empty) are
    * excluded, like the pair mode. All-integer output, bit-exact vs the
    * DuckDB mirror (hashes mirrored by oracle.DuckHash.shingleTokCtes +
    * mix64SignedSql).
    */
  /** The k independent min-hash permutation seeds of [[anchorReps]]:
    * anchor key i = min over eligible tokens of Mix64(token XOR seed_i).
    * Single-permutation anchoring finds a J-near-dup pair with
    * probability ≈ J (measured 425‰ at sf0.1); k independent anchors
    * lift that to ≈ 1−(1−J)^k at still-O(k·n) emitted candidate rows
    * (r13 verdict task #1). Seeds are arbitrary fixed constants —
    * inlined as literals in the DuckDB mirror, so change them only in
    * lockstep with the oracle.
    */
  val AnchorSeeds: Seq[Long] = Seq(0L, -7046029254386353131L, 7640891576956012809L)

  def anchorReps(
      sets: DataFrame,
      tX1000: Int,
      maxTokenDf: Int,
      seeds: Seq[Long] = AnchorSeeds): DataFrame = {
    val docs = anchorDocs(sets, maxTokenDf, seeds)
      .persist(StorageLevel.MEMORY_AND_DISK) // feeds k anchor groupBys + 2 set joins; caller-owned (harness clearCache)
    repsFromDocs(docs, tX1000, seeds.length)
  }

  /** The per-doc anchor aggregate of [[anchorReps]] — (doc_id, bk0..bk_{k-1},
    * fsh, n) — exposed separately (r14) so the k-sweep key computes the
    * token walk + df filter + doc aggregate ONCE for its largest k and
    * derives every smaller-k operating point from the same cached frame
    * (bk_i depends only on seed_i, never on k). Caller owns persistence.
    */
  def anchorDocs(
      sets: DataFrame,
      maxTokenDf: Int,
      seeds: Seq[Long] = AnchorSeeds): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val toks = sets
      .where(col("sh").isNotNull && size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("token"))
    val dfq = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val eligible = toks.join(dfq, "token").where(col("df") <= maxTokenDf)
    def mixed(seed: Long): Column = ColumnBridge.column(
      graft.functions.Mix64Long(
        ColumnBridge.expression(col("token").bitwiseXOR(lit(seed)))))
    // one doc_id exchange carries all k block keys + the filtered set
    val aggs = seeds.zipWithIndex.map { case (sd, i) => min(mixed(sd)).as(s"bk$i") } ++
      Seq(sort_array(collect_list(col("token"))).as("fsh"), count(lit(1)).as("n"))
    eligible.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** The assignment/verify tail of [[anchorReps]] over a (possibly wider —
    * extra bk columns are ignored) [[anchorDocs]] frame, using the first
    * `k` anchor spaces.
    */
  def repsFromDocs(docs: DataFrame, tX1000: Int, k: Int): DataFrame = {
    val seedIdx = 0 until k
    // per-seed blocks → NON-SELF candidate (doc, anchor) assignments,
    // deduped: ≤ k rows per doc ever exist — no pair frame, O(k·n).
    // All k block spaces ride ONE exchange: the k keys posexplode into
    // (seed index, bk) rows and anchors group on the tagged pair — the
    // seed tag keeps permutation spaces disjoint (two seeds can mint
    // the same 64-bit min; untagged they would merge blocks across
    // permutations) while replacing k groupBys + k joins + a union
    // with one groupBy + one join. Self assignments are dropped HERE
    // (see the scaladoc: a self candidate scores Jaccard 1000 and
    // would shadow every true anchor in the best-of window).
    val tagged = docs.select(
      col("doc_id"),
      posexplode(array(seedIdx.map(i => col(s"bk$i")): _*)).as(Seq("i", "bk")))
    val anchors = tagged.groupBy("i", "bk").agg(min("doc_id").as("anchor_id"))
    val cand = tagged
      .join(anchors, Seq("i", "bk"))
      .select("doc_id", "anchor_id")
      .where(col("doc_id") =!= col("anchor_id"))
      .distinct()
    // exact Jaccard to every candidate anchor; arrays are DROPPED before
    // the best-of window so the ≤k-row partitions sort keys, not payloads
    val scored = cand
      .join(docs.select(col("doc_id"), col("fsh"), col("n")), "doc_id")
      .join(docs.select(col("doc_id").as("anchor_id"), col("fsh").as("a_fsh"), col("n").as("a_n")),
        "anchor_id")
      .withColumn("inter", size(array_intersect(col("fsh"), col("a_fsh"))).cast("long"))
      .withColumn("uni", col("n") + col("a_n") - col("inter"))
      .select(col("doc_id"), col("anchor_id"), expr("inter * 1000 div uni").as("jacc_x1000"))
    val best = Window.partitionBy("doc_id").orderBy(col("jacc_x1000").desc, col("anchor_id"))
    val bestRows = scored
      .withColumn("rn", row_number().over(best))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("anchor_id"), col("jacc_x1000"))
    // every eligible doc emits exactly one row; docs with no non-self
    // candidate (singleton blocks under every seed) keep themselves
    docs.select(col("doc_id"))
      .join(bestRows, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("jacc_x1000") >= tX1000, col("anchor_id"))
          .otherwise(col("doc_id")).as("rep_id"),
        coalesce(col("jacc_x1000"), lit(1000L)).as("jacc_x1000"))
  }

  /** All-k sweep tail over an [[anchorDocs]] frame (r15, guide §1.2
    * step 1): for every k in 1..kMax at once, the NON-SELF rows of
    * `repsFromDocs(docs, tX1000, k)` — i.e. (k, doc_id, rep_id,
    * jacc_x1000) where doc_id's best anchor under the first k seed
    * spaces clears the threshold. The r14 sweep ran the whole
    * assignment/verify tail (groupBy + join + distinct + two set joins +
    * best-of window + emission join) once per k; every per-k quantity is
    * derivable from ONE tail over the kMax spaces:
    *  - candidate set at k = assignments with min seed index < k, so one
    *    (doc, anchor) aggregate carrying `mi = min(i)` replaces the per-k
    *    distincts;
    *  - Jaccard is k-independent — one verify join scores every pair;
    *  - best-of at k = min over candidates with mi < k of the struct
    *    (1000 - jacc, anchor_id): struct ordering = the window's
    *    (jacc desc, anchor asc), and all kMax bests ride one groupBy.
    * Per-k output multiset is identical to the per-k tails (R15OptSpec).
    */
  def repsSweepNonSelf(docs: DataFrame, tX1000: Int, kMax: Int): DataFrame = {
    val seedIdx = 0 until kMax
    val tagged = docs.select(
      col("doc_id"),
      posexplode(array(seedIdx.map(i => col(s"bk$i")): _*)).as(Seq("i", "bk")))
    val anchors = tagged.groupBy("i", "bk").agg(min("doc_id").as("anchor_id"))
    val cand = tagged
      .join(anchors, Seq("i", "bk"))
      .where(col("doc_id") =!= col("anchor_id"))
      .groupBy("doc_id", "anchor_id").agg(min("i").as("mi"))
    val scored = cand
      .join(docs.select(col("doc_id"), col("fsh"), col("n")), "doc_id")
      .join(docs.select(col("doc_id").as("anchor_id"), col("fsh").as("a_fsh"), col("n").as("a_n")),
        "anchor_id")
      .withColumn("inter", size(array_intersect(col("fsh"), col("a_fsh"))).cast("long"))
      .withColumn("uni", col("n") + col("a_n") - col("inter"))
      .select(col("doc_id"), col("anchor_id"),
        expr("inter * 1000 div uni").as("jacc_x1000"), col("mi"))
    val bestAggs = (1 to kMax).map { kk =>
      min(when(col("mi") < kk,
        struct((lit(1000L) - col("jacc_x1000")).as("negj"),
          col("anchor_id"), col("jacc_x1000")))).as(s"b$kk")
    }
    val bests = scored.groupBy("doc_id").agg(bestAggs.head, bestAggs.tail: _*)
    bests.select(
      col("doc_id"),
      posexplode(array((1 to kMax).map(kk => col(s"b$kk")): _*)).as(Seq("k0", "b")))
      .where(col("b").isNotNull && col("b.jacc_x1000") >= tX1000)
      .select((col("k0") + 1).cast("long").as("k"), col("doc_id"),
        col("b.anchor_id").as("rep_id"), col("b.jacc_x1000").as("jacc_x1000"))
  }

  /** Generic tokenizer entry: `tokens` is an array<string> Column over
    * `text` — word unigrams discriminate on natural Zipfian
    * vocabularies; word q-shingles (`Text.shingles`) are the right
    * elements when the vocabulary is small or documents share
    * templates. Elements are xxhash64-hashed before the join.
    */
  def prefixJoin(
      docs: DataFrame,
      tokens: Column,
      tX1000: Int,
      maxTokenDf: Int): DataFrame =
    prefixJoinSets(
      docs.select(col("doc_id"), array_distinct(Text.hashedArray(tokens)).as("sh")),
      tX1000, maxTokenDf)

  /** Word-unigram convenience overload. */
  def prefixJoin(docs: DataFrame, tX1000: Int = 600, maxTokenDf: Int = 1000): DataFrame =
    prefixJoin(docs, Text.words(col("text")), tX1000, maxTokenDf)

  /** Ordered pairs (doc_a CONTAINED IN doc_b): exact containment
    * |A∩B|/|A| >= tX1000/1000 over the df-filtered element sets — the
    * asymmetric doc-in-doc relation (quote inclusion, page-in-crawl,
    * excerpt detection) that Jaccard misses when |B| >> |A|.
    *
    * Prefix filter on the PROBE (contained) side only: if A's
    * `|A| - ceil(t·|A|) + 1` rarest tokens miss B entirely, then
    * |A∩B| <= ceil(t·|A|) - 1 < t·|A| (A∩B ⊆ B), so joining A-prefixes
    * against the FULL eligible element relation is complete. Candidate
    * fan-out per token is still bounded by the same df cap as the
    * Jaccard path — containment places no bound on the B side, the df
    * threshold does.
    *
    * Returns (doc_a, doc_b, inter, n_a, n_b, cont_x1000), doc_a != doc_b,
    * integer permille; caller owns the returned persisted frame.
    */
  def containJoinSets(
      sets: DataFrame,
      tX1000: Int,
      maxTokenDf: Int): DataFrame = {
    // see prefixJoinSets: out-of-range permille would break the probe
    // prefix slice at runtime
    require(tX1000 >= 0 && tX1000 <= 1000,
      s"tX1000 must be a permille threshold in [0, 1000], got $tX1000")
    val toks = sets
      .where(col("sh").isNotNull && size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("token"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val dfq = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val eligible = toks.join(dfq, "token").where(col("df") <= maxTokenDf)

    // r14: same one-doc_id-aggregate restructure as [[prefixJoinSets]] —
    // the rarity window, the probe-side prefix, the join's full element
    // relation, and the verify sets all read off ONE cached aggregate
    // instead of re-joining/re-shuffling `eligible` three times.
    val docAgg = eligible
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("rar"),
        count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val prefix = docAgg.select(col("doc_id"),
      explode(expr(
        s"transform(slice(rar, 1, cast(n - ($tX1000 * n + 999) div 1000 + 1 as int)), x -> x.token)"))
        .as("token"))

    val allToks = docAgg.select(col("doc_id"),
      explode(expr("transform(rar, x -> x.token)")).as("token"))

    val cand = prefix.as("l")
      .join(allToks.as("r"), Seq("token"))
      .where(col("l.doc_id") =!= col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()

    val fsets = docAgg.select(col("doc_id"),
      sort_array(expr("transform(rar, x -> x.token)")).as("fsh"), col("n"))
    val verified = cand
      .join(fsets.select(col("doc_id").as("doc_a"), col("fsh").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(fsets.select(col("doc_id").as("doc_b"), col("fsh").as("sh_b"), col("n").as("n_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .where(col("inter") * 1000 >= lit(tX1000.toLong) * col("n_a"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"), col("n_b"),
        expr("inter * 1000 div n_a").as("cont_x1000"))

    val out = verified.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    toks.unpersist(blocking = false)
    docAgg.unpersist(blocking = false)
    out
  }
}
