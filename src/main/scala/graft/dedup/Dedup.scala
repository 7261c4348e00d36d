package graft.dedup

import graft.functions.exprs
import graft.text.Text
import graft.vec.Vec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication family over the `documents` table.
  *
  * Shapes and their 100 TB behavior:
  *  - exact: one shuffle on a 128-bit content hash; map-side partial agg.
  *  - minhash LSH: signatures map-side; one explode(bands) shuffle keyed
  *    by (band index, band hash); candidate pairs only within buckets —
  *    never O(n^2). Band frames carry only (doc_id, band key) through the
  *    shuffle; 16-bit b-bit minwise sketches (not the full 64-bit
  *    signatures) re-join on the (small) candidate set.
  *  - simhash: 64-bit sketch map-side; 4x16-bit band buckets guarantee
  *    recall for hamming distance <= 3; same join shape as minhash.
  *  - ngram jaccard: exact verify pass on LSH candidates only.
  *  - embedding cosine: sign-LSH buckets, pairwise only within buckets.
  */
object Dedup {

  /** Cache lifecycle for the LSH-family functions: the expensive per-doc
    * intermediate (signatures / sketches / shingle sets) feeds several
    * branches of the plan, so it is persisted — but only while this helper
    * materializes the (orders-of-magnitude smaller) candidate result.
    * Intermediates are unpersisted before returning; the caller receives
    * the persisted *result* and owns its lifecycle (`.unpersist()` when
    * done). Nothing else is left in the session cache.
    */
  private def materializeThenRelease(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize while the intermediates are still cached
    intermediates.foreach(_.unpersist(blocking = false))
    out
  }

  /** Exact dedup: survivor = min doc_id per canonical-content hash. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(Text.fingerprintMd5(col("text")).as("content_key"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies", "content_key")

  /** (doc_id, minhash signature) frame. Map-side only; one fused pass
    * over the text (see TextShingleMinHash).
    */
  def signatures(docs: DataFrame, k: Int = 128, shingleK: Int = 3): DataFrame =
    docs.select(
      col("doc_id"),
      exprs.text_minhash_sig(col("text"), k, shingleK).as("sig"))

  /** LSH candidate pairs (doc_a < doc_b) with signature-estimated
    * jaccard. `bands` x `rows` must equal k.
    */
  def minhashCandidates(
      docs: DataFrame,
      k: Int = 128,
      bands: Int = 16,
      minEstJaccard: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame =
    minhashCandidatesFromSigs(signatures(docs, k), k, bands, minEstJaccard, maxBucketSize)

  /** [[minhashCandidates]] starting from PRE-HASHED shingle sets
    * (doc_id, sh: array<long>, e.g. `shingle_block(text).sh`) instead of
    * raw text. `MinHashSig(sh)` is bit-identical to the fused
    * `TextShingleMinHash(text)` — same WordWalk/FNV/Mix64 shingle
    * kernel, and the min over affine permutations is invariant to
    * ShingleBlock's sort+dedup (spec-asserted in R10Spec) — so callers
    * that already derived the shingle frame for another leg (the
    * dedup_minhash_eval truth pass) share ONE corpus text walk.
    */
  def minhashCandidatesFromSets(
      sets: DataFrame,
      k: Int = 128,
      bands: Int = 16,
      minEstJaccard: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame =
    minhashCandidatesFromSigs(
      sets.select(col("doc_id"), exprs.minhash_sig(col("sh"), k).as("sig")),
      k, bands, minEstJaccard, maxBucketSize)

  private def minhashCandidatesFromSigs(
      sigsInput: DataFrame,
      k: Int,
      bands: Int,
      minEstJaccard: Double,
      maxBucketSize: Int): DataFrame = {
    val rows = k / bands
    // The signature subtree is the expensive part and feeds BOTH sides of
    // the self-join plus the verify re-join; persist it once (at 100 TB:
    // MEMORY_AND_DISK, or checkpoint to the signature store).
    // Persist BELOW the null filter: filtering the un-cached projection
    // would let Catalyst push `isnotnull(minhash(text))` under the
    // project and evaluate the k-permutation kernel TWICE per row.
    val sigsAll = sigsInput.persist(StorageLevel.MEMORY_AND_DISK)
    val sigs = sigsAll.where(col("sig").isNotNull)
    val banded = sigs
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            j => struct(j.as("band"), xxhash64(j, slice(col("sig"), j * rows + 1, lit(rows))).as("bh"))))
          .as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    // Skew guard: a band bucket holding >maxBucketSize docs is boilerplate
    // collision (shared headers/templates), not near-duplication — and it
    // would quadratically dominate the self-join. Drop those buckets; the
    // doc pairs they contain still meet in their other (discriminative)
    // bands if genuinely similar. A count-window over (band, bh) needs ONE
    // shuffle of the banded frame, where groupBy-count + re-join needs two.
    val bucketW = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    val bounded = banded
      .withColumn("bucket_n", count(lit(1)).over(bucketW))
      .where(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    // NOTE: pairs has exactly ONE consumer (the estimate join below —
    // the sketches derive from the cached signature frame, not from
    // pairs), so it is deliberately NOT persisted: a persist+materialize
    // here was measured as pure overhead once the candidate-id semi-join
    // prefilter was dropped.
    val pairs = bounded
      .as("l")
      .join(bounded.as("r"), Seq("band", "bh"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    // est-jaccard via b-bit minwise sketches (public b-bit minwise hashing
    // construction): the estimate join carries the low 16 bits of each
    // signature slot as array<smallint> — 4x fewer bytes than the 64-bit
    // signatures. The sketch is projected map-side from the cached
    // signature frame, so whenever the join must shuffle the corpus side
    // (candidate set too big to broadcast), it ships 2-byte slots instead
    // of 8-byte ones; when the candidate set broadcasts, the plan is
    // unchanged. Slotwise equality of truncations adds a false-match
    // probability of 2^-16 per differing slot: the estimator's bias is
    // (1-J)/2^16, far below one estimate quantum (1/k). (A left_semi
    // candidate-id prefilter was measured WORSE here: it forces an extra
    // shuffle of the corpus-sized frame per join side.)
    val sketches = sigs.select(
      col("doc_id"),
      // (& 0xffff) - 32768 maps the 16 low bits into smallint range
      // bijectively (ANSI cast would overflow on 32768..65535)
      transform(col("sig"), x => (x.bitwiseAND(lit(0xffffL)) - lit(32768L)).cast("short")).as("sk"))
    val est = pairs
      .join(sketches.select(col("doc_id").as("doc_a"), col("sk").as("sk_a")), "doc_a")
      .join(sketches.select(col("doc_id").as("doc_b"), col("sk").as("sk_b")), "doc_b")
      .withColumn(
        "est_jaccard",
        // r15: fused one-pass slot compare — same count, same /k estimate
        // as the aggregate(zip_with(when)) chain it replaces (R14OptSpec
        // pins bit-equality). This path was left compositional in r14
        // only because it feeds two frozen bench controls (dedup_minhash,
        // pipe_corpus_prep); the r15 repin lands in the same commit.
        graft.functions.vexprs.sketch_eq_count(col("sk_a"), col("sk_b")).cast("double") / k)
    materializeThenRelease(
      est.where(col("est_jaccard") >= minEstJaccard).select("doc_a", "doc_b", "est_jaccard"),
      sigsAll)
  }

  /** Candidate pairs at several (bands, rows = k/bands) LSH operating
    * points from ONE shared signature pass — the S-curve sweep that
    * picks the banding from data (collision probability at estimated
    * Jaccard s is 1-(1-s^rows)^bands; more bands = higher recall AND
    * more candidates to verify, and this frame quantifies both sides on
    * the actual corpus). Output: (bands, doc_a, doc_b, est_jaccard) for
    * every capped band-collision candidate of every config, UNFILTERED
    * by est so consumers count candidates and est-survivors separately.
    * The expensive k-permutation signature kernel runs once; each config
    * adds only its banding explode + bucket-capped self-join (the
    * per-config plan of [[minhashCandidates]], sharing the cached
    * signatures). Caller owns the returned persisted frame.
    */
  def bandingSweepCandidates(
      docs: DataFrame,
      configs: Seq[Int] = Seq(8, 16, 32),
      k: Int = 128,
      maxBucketSize: Int = 1000): DataFrame = {
    require(configs.forall(b => k % b == 0), s"each band count must divide $k")
    val sigsAll = signatures(docs, k).persist(StorageLevel.MEMORY_AND_DISK)
    val sigs = sigsAll.where(col("sig").isNotNull)
    // r15 (guide §2.4 / §1.2 step 1): ONE banded frame tagged with the
    // config's band count replaces the per-config explode→window→
    // self-join→distinct legs — the r14 shape ran 3 windows (3 full
    // shuffles of the banded relation), 3 joins and 3 distincts even
    // though the signature frame was already shared. Tagging `bands`
    // into the exploded struct and keying every downstream step by
    // (bands, band, bh) keeps each config's bucket cap, join scope and
    // pair-dedup EXACTLY per-config (configs never mix: the key carries
    // the config) while the whole sweep pays one window shuffle, one
    // self-join and one distinct. Per-config pair sets are bit-identical
    // to the old per-leg plan (R15OptSpec pins sweep-vs-minhashCandidates
    // equality per config).
    val banded = sigs
      .select(
        col("doc_id"),
        explode(
          flatten(array(configs.map { bands =>
            val rows = k / bands
            transform(
              sequence(lit(0), lit(bands - 1)),
              j => struct(lit(bands.toLong).as("bands"), j.as("band"),
                xxhash64(j, slice(col("sig"), j * rows + 1, lit(rows))).as("bh")))
          }: _*)))
          .as("b"))
      .select(col("doc_id"), col("b.bands").as("bands"), col("b.band").as("band"), col("b.bh").as("bh"))
    val bounded = banded
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("bands", "band", "bh")))
      .where(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    val pairs = bounded.as("l")
      .join(bounded.as("r"), Seq("bands", "band", "bh"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("bands"), col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val sketches = sigs.select(
      col("doc_id"),
      transform(col("sig"), x => (x.bitwiseAND(lit(0xffffL)) - lit(32768L)).cast("short")).as("sk"))
    val est = pairs
      .join(sketches.select(col("doc_id").as("doc_a"), col("sk").as("sk_a")), "doc_a")
      .join(sketches.select(col("doc_id").as("doc_b"), col("sk").as("sk_b")), "doc_b")
      .withColumn(
        "est_jaccard",
        // fused one-pass slot compare (r14): same count, same /k estimate
        // as the aggregate(zip_with(when)) chain it replaces (R14OptSpec)
        graft.functions.vexprs.sketch_eq_count(col("sk_a"), col("sk_b")).cast("double") / k)
      .select("bands", "doc_a", "doc_b", "est_jaccard")
    materializeThenRelease(est, sigsAll)
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming (<= 3
    * guaranteed found by 4x16-bit banding).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // persist below the null filter (see minhashCandidates: a filter on
    // the un-cached projection would double-evaluate the sketch kernel)
    val simsAll = docs
      .select(col("doc_id"), exprs.simhash64(Text.hashedArray(Text.words(col("text")))).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sims = simsAll.where(col("sh").isNotNull)
    // shiftrightunsigned takes a literal shift, so build the 4 bands explicitly.
    val bandCols = (0 until 4).map(j =>
      struct(lit(j).as("band"), shiftrightunsigned(col("sh"), 16 * j).bitwiseAND(lit(0xffffL)).as("bh")))
    val banded = sims
      .select(col("doc_id"), col("sh"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("sh"), col("b.band").as("band"), col("b.bh").as("bh"))
    materializeThenRelease(
      banded
        .as("l")
        .join(banded.as("r"), Seq("band", "bh"))
        .where(col("l.doc_id") < col("r.doc_id"))
        .select(
          col("l.doc_id").as("doc_a"),
          col("r.doc_id").as("doc_b"),
          call_function("bit_count", col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
        .where(col("hamming") <= maxHamming)
        .distinct(),
      simsAll)
  }

  /** Prefix-blocked exact n-gram Jaccard over the whole corpus: block on
    * the first `prefixN` canonical words (near-dup edits cluster at
    * document tails), exact Jaccard over distinct shingle-hash sets
    * within blocks. One fused ShingleBlock pass per doc — persisted
    * BELOW the null filter so pushdown cannot double-evaluate the
    * kernel, and the (doc_id, pfx, sh) frame feeds both self-join sides
    * from cache. Result is materialized then intermediates released
    * (caller owns the returned frame's lifecycle).
    */
  /** Integer pair statistics of the blocked shingle join: (doc_a,
    * doc_b, inter, uni) for every same-prefix-block pair — the exact
    * counts behind the Jaccard ratio, for consumers that must classify
    * against thresholds WITHOUT a float division (cross-multiply
    * inter·1000 ≥ t·uni stays in integers end to end). Same block
    * contract and cache discipline as [[blockedNgramJaccard]].
    */
  def blockedPairStats(
      docs: DataFrame,
      shingleK: Int = 3,
      prefixN: Int = 3,
      maxBlockSize: Int = 1000): DataFrame = {
    val blockedAll = docs
      .select(col("doc_id"), exprs.shingle_block(col("text"), shingleK, prefixN).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val blocked = capBlocks(blockedAll.where(col("b").isNotNull)
      .select(col("doc_id"), col("b.pfx").as("pfx"), col("b.sh").as("sh")), maxBlockSize)
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
    materializeThenRelease(
      blocked.as("l")
        .join(blocked.as("r"), Seq("pfx"))
        .where(col("l.doc_id") < col("r.doc_id"))
        .select(
          col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
          col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
        .select(col("doc_a"), col("doc_b"), inter.as("inter"),
          (size(col("sh_a")).cast("long") + size(col("sh_b")).cast("long") - inter).as("uni")),
      blockedAll)
  }

  /** Skew guard shared by the blocked-pair modes: a prefix block holding
    * more than `maxBlockSize` docs is boilerplate (pair output grows as
    * block²; a 10k-copy block would emit ~50M pairs) — drop the whole
    * block, mirroring the LSH `maxBucketSize` contract. Implemented as a
    * map-side-combined count on the PROJECTED (pfx) key + a broadcast
    * anti-join of the oversized block set (empty on real corpora) — the
    * original count WINDOW partitioned by pfx dragged the full shingle
    * arrays through an extra exchange+sort, which the r11 close bench
    * measured as ~1.5-2x on every consumer of this path.
    */
  private def capBlocks(blocked: DataFrame, maxBlockSize: Int): DataFrame = {
    val oversized = blocked.groupBy("pfx").agg(count(lit(1)).as("block_n"))
      .where(col("block_n") > maxBlockSize)
      .select("pfx")
    // Boilerplate blocks are rare by construction (each one holds >
    // maxBlockSize near-identical docs), so the set usually fits in a
    // literal: collect up to 64 keys and push a pure map-side NOT-isin
    // filter into the join's own scan — no BroadcastExchange, no join
    // operator, and the collect job doubles as the cache-fill pass for
    // the persisted shingle frame. More than 64 oversized blocks (a
    // pathological corpus) falls back to the unbounded broadcast
    // anti-join; the driver transfer stays capped either way.
    val few = oversized.limit(65).collect().map(_.getLong(0))
    if (few.isEmpty) blocked
    else if (few.length <= 64) blocked.where(!col("pfx").isin(few: _*))
    else blocked.join(broadcast(oversized), Seq("pfx"), "left_anti")
  }

  def blockedNgramJaccard(
      docs: DataFrame,
      shingleK: Int = 3,
      prefixN: Int = 3,
      minJaccard: Double = 0.5,
      maxBlockSize: Int = 1000): DataFrame = {
    val blockedAll = docs
      .select(col("doc_id"), exprs.shingle_block(col("text"), shingleK, prefixN).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val blocked = capBlocks(blockedAll.where(col("b").isNotNull)
      .select(col("doc_id"), col("b.pfx").as("pfx"), col("b.sh").as("sh")), maxBlockSize)
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    materializeThenRelease(
      blocked.as("l")
        .join(blocked.as("r"), Seq("pfx"))
        .where(col("l.doc_id") < col("r.doc_id"))
        .select(
          col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
          col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
        .withColumn(
          "jaccard",
          inter.cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - inter).cast("double"))
        .where(col("jaccard") >= minJaccard)
        .select("doc_a", "doc_b", "jaccard"),
      blockedAll)
  }

  /** O(n)-output scale path for the blocked n-gram dedup: instead of
    * ALL similar pairs — quadratic in duplicate-group size, so a
    * 10k-copy boilerplate block would emit ~50M pairs — each doc is
    * compared ONLY to its block's anchor (the minimum doc_id in its
    * prefix block) and emits exactly one row:
    * (doc_id, rep_id, jaccard-to-anchor), rep_id = anchor when
    * jaccard >= minJaccard, else the doc itself (the anchor is its own
    * rep at jaccard 1.0). Compute is O(block size) per block and output
    * O(corpus) regardless of duplication rate — the emission contract a
    * boilerplate-heavy 100 TB corpus needs. `blockedNgramJaccard`
    * remains the all-pairs mode for small candidate sets where the
    * pair list itself is the product. Recall contract: a doc similar to
    * other block members but not to the anchor keeps itself as rep —
    * representative assignment, not full transitive clustering (that is
    * Components.minLabel's job on the pair mode's output).
    *
    * Plan shape: ONE groupBy(pfx) with a map-side-combined min_by
    * carries the anchor's shingle set; the join back on pfx reuses the
    * same hash partitioning, so the whole operator costs one exchange
    * of the (doc_id, pfx, sh) frame.
    */
  def ngramAnchorReps(
      docs: DataFrame,
      shingleK: Int = 3,
      prefixN: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    val blockedAll = docs
      .select(col("doc_id"), exprs.shingle_block(col("text"), shingleK, prefixN).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val blocked = blockedAll.where(col("b").isNotNull)
      .select(col("doc_id"), col("b.pfx").as("pfx"), col("b.sh").as("sh"))
    val anchors = blocked
      .groupBy("pfx")
      .agg(min_by(struct(col("doc_id"), col("sh")), col("doc_id")).as("a"))
      .select(col("pfx"), col("a.doc_id").as("anchor_id"), col("a.sh").as("anchor_sh"))
    val inter = size(array_intersect(col("sh"), col("anchor_sh")))
    materializeThenRelease(
      blocked.join(anchors, Seq("pfx"))
        .withColumn(
          "jaccard",
          inter.cast("double") /
            (size(col("sh")) + size(col("anchor_sh")) - inter).cast("double"))
        .select(
          col("doc_id"),
          when(col("jaccard") >= minJaccard, col("anchor_id"))
            .otherwise(col("doc_id")).as("rep_id"),
          col("jaccard")),
      blockedAll)
  }

  /** Exact n-gram Jaccard verification over candidate pairs.
    *
    * Shingle sets are computed ONLY for docs appearing in `pairs` (semi-
    * join prefilter): at corpus scale the candidate set is orders of
    * magnitude smaller than the corpus, so the expensive per-doc kernel
    * never touches non-candidates. Jaccard runs on sorted distinct
    * 64-bit shingle hashes (see ShingleBlock) — identical to string-set
    * Jaccard up to ~1e-15 collision odds per pair.
    */
  def ngramJaccard(
      docs: DataFrame,
      pairs: DataFrame,
      shingleK: Int = 3,
      minJaccard: Double = 0.7): DataFrame = {
    val ids = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val sh = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), exprs.shingle_block(col("text"), shingleK).as("b"))
      .where(col("b").isNotNull)
      .select(col("doc_id"), col("b.sh").as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    materializeThenRelease(
      pairs
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn(
          "jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) -
              size(array_intersect(col("sh_a"), col("sh_b")))).cast("double"))
        .where(col("jaccard") >= minJaccard)
        .select("doc_a", "doc_b", "jaccard"),
      sh)
  }

  /** Embedding near-dup: sign-LSH buckets, exact cosine within buckets.
    * Quantized cosine for deterministic output.
    */
  def embedCosinePairs(embeddings: DataFrame, p: Int = 8, minCosine: Double = 0.95): DataFrame = {
    val b = embeddings.select(
      col("vec_id"),
      Vec.quantize(col("embedding")).as("q"),
      Vec.lshBucket(col("embedding"), p).as("bucket"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    materializeThenRelease(
      b.as("l")
        .join(b.as("r"), Seq("bucket"))
        .where(col("l.vec_id") < col("r.vec_id"))
        .select(
          col("l.vec_id").as("vec_a"),
          col("r.vec_id").as("vec_b"),
          Vec.cosineQ(col("l.q"), col("r.q")).as("cosine"))
        .where(col("cosine") >= minCosine)
        .distinct(),
      b)
  }
}
