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
    // (doc_id, token) element relation; persisted — feeds the df
    // aggregate, the ranking window, and the filtered-set rebuild.
    val toks = sets
      .where(col("sh").isNotNull && size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("token"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val dfq = toks.groupBy("token").agg(count(lit(1)).as("df"))

    // Similarity universe = non-viral tokens only (df-deterministic cap).
    val eligible = toks.join(dfq, "token").where(col("df") <= maxTokenDf)

    // Rarest-first rank and filtered set size share ONE doc_id window
    // shuffle. Ties on df are broken by token value — any fixed order
    // satisfies the prefix-filter completeness theorem.
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("token"))
    val byDoc = Window.partitionBy("doc_id")
    val prefix = eligible
      .withColumn("rn", row_number().over(byRarity))
      .withColumn("n", count(lit(1)).over(byDoc))
      .where(col("rn") <= col("n") - expr(s"($tX1000 * n + 999) div 1000") + 1)
      .select("doc_id", "token")

    val cand = prefix.as("l")
      .join(prefix.as("r"), Seq("token"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()

    // Filtered sets rebuilt once (sorted for determinism), then exact
    // |A∩B| via map-side array_intersect on the candidate pairs.
    val fsets = eligible
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("token"))).as("fsh"), count(lit(1)).as("n"))
    val verified = cand
      .join(fsets.select(col("doc_id").as("doc_a"), col("fsh").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(fsets.select(col("doc_id").as("doc_b"), col("fsh").as("sh_b"), col("n").as("n_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * 1000 >= lit(tX1000.toLong) * col("uni"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        expr("inter * 1000 div uni").as("jacc_x1000"))

    val out = verified.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    toks.unpersist(blocking = false)
    out
  }

  /** O(n)-OUTPUT anchor-representative twin of [[prefixJoinSets]] — the
    * 100 TB emission contract for boilerplate-heavy corpora (the
    * `dedup_ngram_reps` trick applied to the set-similarity family): the
    * all-pairs mode is quadratic in duplicate-group size (a 10k-copy
    * viral block emits ~50M qualifying pairs; this emits 10k rows).
    *
    * Block key = each doc's MINIMUM eligible token hash — single-
    * permutation MinHash anchoring (Broder's min-wise independence:
    * two sets share their minimum under a random hash order with
    * probability exactly their Jaccard). Exact duplicates ALWAYS share
    * the block; a 0.7-near-dup shares it with probability ≈ 0.7. A
    * rarest-token key was tried first and rejected: a near-dup's edit
    * introduces a globally-UNIQUE shingle which becomes its rarest
    * token, so non-exact dups essentially never shared their anchor's
    * block (recall ~0 by construction, not by chance).
    *
    * Docs sharing their min token form a block; the block's anchor is
    * its min doc_id; every doc emits exactly one row (doc_id, rep_id,
    * jacc_x1000) where rep_id = anchor when exact df-filtered Jaccard
    * to the anchor clears the threshold, else the doc itself. Unlike
    * the pair-complete mode this is a RECALL-TRADED contract
    * (probability ≈ J of sharing the block, and an unrelated block
    * anchor shadows a true near-dup pair) — the certified pair-complete
    * operator stays available; this is the emission-bounded production
    * mode, and `dedup_setsim_reps_eval` publishes the measured recall.
    *
    * Shapes: one groupBy(token) for df, one doc_id groupBy for per-doc
    * (min token, filtered set, size) — min and collect_list ride the
    * same exchange — one groupBy(block) for anchors, one join to attach
    * the anchor's set, one map-side array_intersect per doc. No
    * candidate pair frame exists at all. Docs with zero eligible tokens
    * (all-viral or empty) are excluded, like the pair mode. All-integer
    * output, bit-exact vs the DuckDB mirror (hashes mirrored by
    * oracle.DuckHash.shingleTokCtes).
    */
  def anchorReps(sets: DataFrame, tX1000: Int, maxTokenDf: Int): DataFrame = {
    val toks = sets
      .where(col("sh").isNotNull && size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("token"))
    val dfq = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val eligible = toks.join(dfq, "token").where(col("df") <= maxTokenDf)
    val docs = eligible
      .groupBy("doc_id")
      .agg(
        min(col("token")).as("bk"),
        sort_array(collect_list(col("token"))).as("fsh"),
        count(lit(1)).as("n"))
    val anchors = docs.groupBy("bk").agg(min("doc_id").as("anchor_id"))
    val aSets = anchors.join(
      docs.select(col("doc_id").as("anchor_id"), col("fsh").as("a_fsh"), col("n").as("a_n")),
      "anchor_id")
    docs.join(aSets, "bk")
      .withColumn("inter", size(array_intersect(col("fsh"), col("a_fsh"))).cast("long"))
      .withColumn("uni", col("n") + col("a_n") - col("inter"))
      .withColumn("jacc_x1000", expr("inter * 1000 div uni"))
      .select(
        col("doc_id"),
        when(col("doc_id") === col("anchor_id"), col("doc_id"))
          .when(col("jacc_x1000") >= tX1000, col("anchor_id"))
          .otherwise(col("doc_id")).as("rep_id"),
        col("jacc_x1000"))
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
    val toks = sets
      .where(col("sh").isNotNull && size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("token"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val dfq = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val eligible = toks.join(dfq, "token").where(col("df") <= maxTokenDf)

    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("token"))
    val byDoc = Window.partitionBy("doc_id")
    val prefix = eligible
      .withColumn("rn", row_number().over(byRarity))
      .withColumn("n", count(lit(1)).over(byDoc))
      .where(col("rn") <= col("n") - expr(s"($tX1000 * n + 999) div 1000") + 1)
      .select("doc_id", "token")

    val cand = prefix.as("l")
      .join(eligible.select("doc_id", "token").as("r"), Seq("token"))
      .where(col("l.doc_id") =!= col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()

    val fsets = eligible
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("token"))).as("fsh"), count(lit(1)).as("n"))
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
    out
  }
}
