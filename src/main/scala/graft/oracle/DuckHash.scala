package graft.oracle

import graft.functions.{Mix64, WordWalk}

/** DuckDB SQL generators that reproduce graft's hash kernels BIT-EXACTLY,
  * upgrading the dedup_minhash / dedup_simhash correctness checks from
  * rows-only to full hash-exact oracles.
  *
  * The obstacle these builders remove: DuckDB has no xxhash64, no wrapping
  * 64-bit arithmetic (BIGINT ops overflow-check), and its `<<` rejects
  * UBIGINT results >= 2^63. The kernels are therefore re-expressed with:
  *  - wrapping multiply split into 32-bit halves over HUGEINT:
  *    a*b mod 2^64 = (a_lo*b + ((a_hi*b_lo) mod 2^32)*2^32) mod 2^64
  *  - left shift as UBIGINT multiply (full 2^64-1 range)
  *  - let-bindings via single-element `list_transform([e], v -> body)[1]`
  *    so each sub-value is evaluated once (without them the xor(x, x>>n)
  *    chains double the expression tree per step)
  *  - per-permutation / per-band constants (SplitMix64 coefficients, XXH64
  *    band seeds) precomputed here in Scala and inlined as literals —
  *    the same seeded-constant-inlining precedent as the sign-LSH oracle.
  *
  * Scope note: the simhash word hash implements Spark XXH64's sub-32-byte
  * path (8-byte chunks + 4-byte + byte tail + fmix). Canonical words in
  * the corpus are <= 8 bytes (verified at sf0.001/0.01/0.1); a >= 32-byte
  * word would make the oracle mismatch loudly, which is the gate's job.
  */
object DuckHash {

  // ---- constants shared with the Spark kernels ----
  private val Two64 = BigInt(1) << 64
  private def u64(x: BigInt): BigInt = x & (Two64 - 1)

  private val FnvOffset = BigInt(WordWalk.FnvOffset) & (Two64 - 1)
  private val FnvPrime = BigInt(WordWalk.FnvPrime)

  // XXH64 primes (decimal, as in Spark's XXH64 bytecode)
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")

  private val Seed = 42L
  private val K = 128

  private def coefA(i: Int): BigInt = u64(BigInt(Mix64(Seed + 2L * i) | 1L))
  private def coefB(i: Int): BigInt = u64(BigInt(Mix64(Seed + 2L * i + 1L)))

  private def rotlPy(x: BigInt, n: Int): BigInt = u64((x << n) | (x >> (64 - n)))
  private def fmixPy(h0: BigInt): BigInt = {
    var h = h0
    h ^= h >> 33; h = u64(h * P2); h ^= h >> 29; h = u64(h * P3); h ^= h >> 32
    h
  }
  /** Spark XXH64.hashInt — used to precompute the 16 band seeds. */
  private def xxhInt(i: Int, seed: Long): BigInt = {
    var h = u64(BigInt(seed) + P5 + 4)
    h = u64(h ^ u64(BigInt(i & 0xFFFFFFFFL.toInt) * P1))
    h = u64(rotlPy(h, 23) * P2 + P3)
    fmixPy(h)
  }
  private val bandSeeds: Seq[BigInt] = (0 until 16).map(xxhInt(_, Seed))

  // ---- SQL builders ----
  private var fresh = 0
  private def let(expr: String)(body: String => String): String = {
    fresh += 1
    val v = s"g$fresh"
    s"list_transform([$expr], $v -> ${body(v)})[1]"
  }

  /** (x * c) mod 2^64 for a UBIGINT expr and a constant.
    *
    * All "mod 2^n" reductions in this file are bit-masks (`& (2^n-1)`),
    * not `%`: the operands are provably non-negative (UBIGINT casts,
    * xors of UBIGINTs, positive constants), where mask ≡ mod — and
    * DuckDB's HUGEINT `%` is a full 128-bit division (~20× the cost of
    * the multiply it follows), which made the hash-heavy oracle mirrors
    * dominate the correctness gate's wall-time.
    */
  private def wrapmul(x: String, c: BigInt): String = {
    val clo = c & 0xFFFFFFFFL
    let(x)(v =>
      s"CAST(((CAST($v & 4294967295 AS HUGEINT) * $c) + " +
        s"((CAST($v >> 32 AS HUGEINT) * $clo) & 4294967295) * 4294967296) " +
        s"& 18446744073709551615 AS UBIGINT)")
  }

  private def addmod(x: String, c: BigInt): String =
    s"CAST((CAST($x AS HUGEINT) + $c) & 18446744073709551615 AS UBIGINT)"

  private def xorShr(x: String, n: Int): String =
    let(x)(v => s"xor($v, $v >> $n)")

  /** Left rotation; the left shift is a UBIGINT multiply because DuckDB's
    * `<<` overflow check rejects in-range UBIGINT results >= 2^63.
    */
  private def rotl(x: String, n: Int): String =
    let(x)(v =>
      s"((($v & CAST(${(Two64 >> n) - 1} AS UBIGINT)) * CAST(${BigInt(1) << n} AS UBIGINT)) | ($v >> ${64 - n}))")

  private def mix64Sql(x: String): String = {
    val z0 = addmod(x, BigInt("11400714819323198485")) // 0x9e3779b97f4a7c15
    val z1 = wrapmul(xorShr(z0, 30), BigInt("13787848793156543929")) // 0xbf58476d1ce4e5b9
    val z2 = wrapmul(xorShr(z1, 27), BigInt("10723151780598845931")) // 0x94d049bb133111eb
    xorShr(z2, 31)
  }

  /** Split bucket of a non-negative BIGINT expr: mirrors the Spark side's
    * `Mix64Long(x) >>> 32 % m` (graft.functions.Mix64Long +
    * shiftrightunsigned). The TOP 32 bits are used so the modulo runs on
    * a value both engines agree is non-negative — no signed/unsigned
    * mod reconciliation needed.
    */
  def mix64BucketSql(x: String, m: Int): String =
    s"CAST((${mix64Sql(s"CAST($x AS UBIGINT)")} >> 32) % $m AS BIGINT)"

  /** Top 32 mixed bits of a non-negative BIGINT expr, as BIGINT in
    * [0, 2^32): mirrors the Spark side's `Mix64Long(x) >>> 32`
    * (the deterministic-uniform source for order sampling).
    */
  def mix64Top32Sql(x: String): String =
    s"CAST(${mix64Sql(s"CAST($x AS UBIGINT)")} >> 32 AS BIGINT)"

  /** Full signed Mix64 of a signed-BIGINT expr: mirrors the Spark
    * side's raw `Mix64Long(x)` output bit-for-bit (two's-complement
    * wraparound through UBIGINT arithmetic, re-signed at the end) —
    * the content-addressable row-id kernel.
    */
  def mix64SignedSql(x: String): String = {
    val u = s"CAST(CAST($x AS HUGEINT) + CASE WHEN $x < 0 " +
      "THEN 18446744073709551616 ELSE 0 END AS UBIGINT)"
    val m = mix64Sql(u)
    s"CAST(CAST($m AS HUGEINT) - CASE WHEN $m >= 9223372036854775808 " +
      "THEN 18446744073709551616 ELSE 0 END AS BIGINT)"
  }

  /** Top 48 mixed bits (>> 16), as BIGINT in [0, 2^48): mirrors the
    * Spark side's `Mix64Long(x) >>> 16` (epoch-shuffle order hashes,
    * where 32 bits would collide on large corpora).
    */
  def mix64Top48Sql(x: String): String =
    s"CAST(${mix64Sql(s"CAST($x AS UBIGINT)")} >> 16 AS BIGINT)"

  /** FNV-1a fold over a UBIGINT list (offset prepended: DuckDB 1.0's
    * list_reduce has no initial-value form).
    */
  private def fnvFold(listExpr: String): String =
    s"list_reduce([CAST($FnvOffset AS UBIGINT)] || ($listExpr), " +
      s"(a, c) -> CAST((CAST(xor(a, c) AS HUGEINT) * $FnvPrime) " +
      s"& 18446744073709551615 AS UBIGINT))"

  private def signed(x: String): String =
    s"CAST(CAST($x AS HUGEINT) - CASE WHEN $x >= 9223372036854775808 " +
      s"THEN 18446744073709551616 ELSE 0 END AS BIGINT)"

  private def unsigned(x: String): String =
    s"CAST(CAST($x AS HUGEINT) + CASE WHEN $x < 0 " +
      s"THEN 18446744073709551616 ELSE 0 END AS UBIGINT)"

  /** Spark XXH64.hashLong(x, acc) — the per-element step of the band fold. */
  private def hashLong(xSigned: String, acc: String): String = {
    val t = wrapmul(rotl(wrapmul(unsigned(xSigned), P2), 31), P1)
    val h0 = addmod(acc, P5 + 8)
    val h1 = s"xor($h0, $t)"
    val h2 = addmod(wrapmul(rotl(h1, 27), P1), P4)
    val f1 = wrapmul(xorShr(h2, 33), P2)
    val f2 = wrapmul(xorShr(f1, 29), P3)
    xorShr(f2, 32)
  }

  private val canon = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
  private val words =
    s"CASE WHEN length($canon) = 0 THEN CAST([] AS VARCHAR[]) ELSE string_split($canon, ' ') END"

  /** FNV+Mix64 word hash over ASCII char codes (mirrors WordWalk on the
    * canonical words — identical by construction of Text.canon).
    */
  private val wordHashSql = mix64Sql(fnvFold(
    "list_transform(range(1, length(wd) + 1), ci -> CAST(unicode(wd[ci]) AS UBIGINT))"))

  /** CTE chain computing the minhash LSH candidate pipeline over `src`
    * (any relation with doc_id + text), ending in relation
    * `mh`(doc_a, doc_b, est_jaccard) filtered at `minEst`. Mirrors
    * Dedup.minhashCandidates: TextShingleMinHash signatures -> 16-band
    * xxhash64 keys -> capped buckets -> candidate pairs ->
    * 16-bit-sketch estimated jaccard. Bit-exact vs Spark.
    */
  def minhashCtes(src: String, minEst: Double): String = {
    s"""${sigCtes(src)},
       |capped AS MATERIALIZED (
       |  SELECT doc_id, band, bh FROM (
       |    SELECT doc_id, band, bh, count(*) OVER (PARTITION BY band, bh) AS n FROM banded)
       |  WHERE n <= 1000),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM capped l JOIN capped r USING (band, bh)
       |  WHERE l.doc_id < r.doc_id),
       |est AS MATERIALIZED (
       |  SELECT doc_a, doc_b,
       |    CAST(list_sum(list_transform(range(1, 129),
       |      i -> CASE WHEN a.sk[i] = b.sk[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 128 AS est_jaccard
       |  FROM pairs
       |  JOIN sk a ON a.doc_id = doc_a
       |  JOIN sk b ON b.doc_id = doc_b),
       |mh AS MATERIALIZED (SELECT * FROM est WHERE est_jaccard >= $minEst)""".stripMargin
  }

  /** Shared signature chain over `src` (doc_id + text): canonical words
    * -> FNV+Mix64 word hashes -> 3-shingle hashes -> 128-slot minhash
    * signatures (`sg`), 16-band xxhash64 bucket keys (`banded`), and
    * 16-bit b-bit sketches (`sk`). Bit-exact vs TextShingleMinHash /
    * Dedup.signatures; composed by the minhash and incremental oracles.
    */
  private def sigCtes(src: String): String = {
    val coefs = (0 until K).map { i =>
      val a = coefA(i)
      s"{'i': $i, 'a': CAST($a AS HUGEINT), 'al': CAST(${a & 0xFFFFFFFFL} AS HUGEINT), 'b': CAST(${coefB(i)} AS HUGEINT)}"
    }.mkString(", ")
    val seeds = bandSeeds.map(s => s"CAST($s AS UBIGINT)").mkString(", ")
    val bh = signed(
      s"list_reduce([([$seeds])[band+1]] || sig[band*8+1 : band*8+8], (a, c) -> ${hashLong("c", "a")})")
    // Permutation mins are computed ROW-WISE (shingle rows × a 128-row
    // coefficient relation → vectorized MIN ... GROUP BY), not as nested
    // list lambdas per doc: DuckDB parallelizes and vectorizes the
    // row-based shape, where the per-doc lambda form runs interpreted on
    // one thread (500 rows is below its morsel granularity) and
    // dominated the whole oracle-gate wall-time. Same values, same
    // signed-min semantics — only the plan shape changes.
    val permRow = signed(
      "CAST((sp.lo * c.c.a + ((sp.hi * c.c.al) & 4294967295) * 4294967296 + c.c.b) " +
        "& 18446744073709551615 AS UBIGINT)")
    s"""d0 AS MATERIALIZED (SELECT doc_id, $words AS w FROM $src),
       |dw AS MATERIALIZED (
       |  SELECT doc_id, list_transform(w, wd -> $wordHashSql) AS wh
       |  FROM d0 WHERE len(w) > 0),
       |sh AS MATERIALIZED (
       |  SELECT doc_id, list_transform(
       |    range(0, CASE WHEN len(wh) <= 3 THEN 1 ELSE len(wh) - 2 END),
       |    si -> ${let("LEAST(3, len(wh))")(wd2 => mix64Sql(fnvFold(s"wh[si+1 : si+$wd2]")))}) AS shs
       |  FROM dw),
       |shp AS MATERIALIZED (
       |  SELECT doc_id, CAST(h & 4294967295 AS HUGEINT) AS lo, CAST(h >> 32 AS HUGEINT) AS hi
       |  FROM (SELECT doc_id, unnest(shs) AS h FROM sh)),
       |pmv AS MATERIALIZED (
       |  SELECT sp.doc_id, c.c.i AS i, MIN($permRow) AS mn
       |  FROM shp sp, (SELECT unnest([$coefs]) AS c) c
       |  GROUP BY sp.doc_id, c.c.i),
       |sg AS MATERIALIZED (SELECT doc_id, list(mn ORDER BY i) AS sig FROM pmv GROUP BY doc_id),
       |banded AS MATERIALIZED (
       |  SELECT doc_id, band, $bh AS bh
       |  FROM sg, (SELECT unnest(range(16)) AS band)),
       |sk AS MATERIALIZED (SELECT doc_id, list_transform(sig, v -> v & 65535) AS sk FROM sg)""".stripMargin
  }

  /** Distinct hashed-3-shingle element relation over `src` (doc_id +
    * text), ending in `tok(doc_id, token)` with token = the SIGNED
    * shingle hash — bit-exact vs `functions.exprs.shingle_block`'s `sh`
    * field (same canonical words -> FNV+Mix64 word hashes -> 3-shingle
    * FNV+Mix64 chain as the minhash mirror; signed so ORDER BY token
    * matches Spark's LongType ordering, which the setsim anchor-reps
    * tie-break depends on). Docs with no words contribute nothing,
    * mirroring shingle_block's null on empty canon.
    */
  def shingleTokCtes(src: String): String =
    s"""d0 AS MATERIALIZED (SELECT doc_id, $words AS w FROM $src),
       |dw AS MATERIALIZED (
       |  SELECT doc_id, list_transform(w, wd -> $wordHashSql) AS wh
       |  FROM d0 WHERE len(w) > 0),
       |shl AS MATERIALIZED (
       |  SELECT doc_id, list_transform(
       |    range(0, CASE WHEN len(wh) <= 3 THEN 1 ELSE len(wh) - 2 END),
       |    si -> ${let("LEAST(3, len(wh))")(wd2 => mix64Sql(fnvFold(s"wh[si+1 : si+$wd2]")))}) AS shs
       |  FROM dw),
       |tok AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ${signed("h")} AS token
       |  FROM (SELECT doc_id, unnest(shs) AS h FROM shl))""".stripMargin

  /** dedup_incremental oracle: batch docs (doc_id % 4 = 3) classified
    * against the history (doc_id % 4 <> 3) — `exact` on md5(canonical
    * text) match, else `near` on an LSH band-bucket collision (bucket
    * cap applied INSIDE the history, mirroring Incremental.buildIndex)
    * verified at sketch-estimated jaccard >= `minEst`, else `novel`.
    */
  def incrementalSql(minEst: Double): String =
    s"""WITH ${sigCtes("documents")},
       |bdocs AS MATERIALIZED (SELECT doc_id FROM documents WHERE doc_id % 4 = 3),
       |hkeys AS MATERIALIZED (
       |  SELECT md5($canon) AS content_key, MIN(doc_id) AS hist_id
       |  FROM documents WHERE doc_id % 4 <> 3 GROUP BY 1),
       |bkeys AS MATERIALIZED (
       |  SELECT doc_id, md5($canon) AS content_key
       |  FROM documents WHERE doc_id % 4 = 3),
       |exact AS MATERIALIZED (
       |  SELECT k.doc_id, h.hist_id FROM bkeys k JOIN hkeys h USING (content_key)),
       |hcap AS MATERIALIZED (
       |  SELECT doc_id, band, bh FROM (
       |    SELECT doc_id, band, bh, count(*) OVER (PARTITION BY band, bh) AS n
       |    FROM banded WHERE doc_id % 4 <> 3)
       |  WHERE n <= 1000),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT b.doc_id AS doc_id, h.doc_id AS hist_id
       |  FROM (SELECT * FROM banded WHERE doc_id % 4 = 3) b
       |  JOIN hcap h USING (band, bh)),
       |near AS MATERIALIZED (
       |  SELECT doc_id, MIN(hist_id) AS near_id FROM (
       |    SELECT c.doc_id, c.hist_id,
       |      CAST(list_sum(list_transform(range(1, 129),
       |        i -> CASE WHEN a.sk[i] = b.sk[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 128 AS est
       |    FROM cand c
       |    JOIN sk a ON a.doc_id = c.doc_id
       |    JOIN sk b ON b.doc_id = c.hist_id)
       |  WHERE est >= $minEst GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CASE WHEN e.hist_id IS NOT NULL THEN 'exact'
       |       WHEN n.near_id IS NOT NULL THEN 'near'
       |       ELSE 'novel' END AS verdict,
       |  CAST(COALESCE(e.hist_id, n.near_id) AS BIGINT) AS match_id
       |FROM bdocs d
       |LEFT JOIN exact e USING (doc_id)
       |LEFT JOIN near n ON n.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** One classify pass as CTEs: docs matching `deltaPred` scored
    * exact / near / novel against index CTEs `keysCte` (content_key,
    * hist_id) and `bandsCte` (doc_id, band, bh). Emits `<p>k/<p>e/<p>c/
    * <p>n/<p>v` prefixed CTEs; `<p>v` is the verdict frame.
    */
  private def classifyCtes(p: String, deltaPred: String, keysCte: String,
      bandsCte: String, minEst: Double): String =
    s"""${p}k AS MATERIALIZED (
       |  SELECT doc_id, md5($canon) AS content_key
       |  FROM documents WHERE $deltaPred),
       |${p}e AS MATERIALIZED (
       |  SELECT k.doc_id, MIN(h.hist_id) AS exact_id
       |  FROM ${p}k k JOIN $keysCte h USING (content_key) GROUP BY 1),
       |${p}c AS MATERIALIZED (
       |  SELECT DISTINCT b.doc_id AS doc_id, h.doc_id AS hist_id
       |  FROM (SELECT * FROM banded WHERE $deltaPred) b
       |  JOIN $bandsCte h USING (band, bh)),
       |${p}n AS MATERIALIZED (
       |  SELECT doc_id, MIN(hist_id) AS near_id FROM (
       |    SELECT c.doc_id, c.hist_id,
       |      CAST(list_sum(list_transform(range(1, 129),
       |        i -> CASE WHEN a.sk[i] = b.sk[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 128 AS est
       |    FROM ${p}c c
       |    JOIN sk a ON a.doc_id = c.doc_id
       |    JOIN sk b ON b.doc_id = c.hist_id)
       |  WHERE est >= $minEst GROUP BY doc_id),
       |${p}v AS MATERIALIZED (
       |  SELECT d.doc_id,
       |    CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
       |         WHEN n.near_id IS NOT NULL THEN 'near'
       |         ELSE 'novel' END AS verdict,
       |    COALESCE(e.exact_id, n.near_id) AS match_id
       |  FROM (SELECT doc_id FROM documents WHERE $deltaPred) d
       |  LEFT JOIN ${p}e e USING (doc_id)
       |  LEFT JOIN ${p}n n ON n.doc_id = d.doc_id)""".stripMargin

  /** dedup_incremental_delta oracle: the absorb loop unrolled. History
    * (doc_id % 4 < 2) builds the index; delta 1 (% 4 = 2) classifies
    * against it and its novel docs are absorbed — keys merged, band keys
    * capped WITHIN the appended segment exactly as
    * Incremental.appendBatch does; delta 2 (% 4 = 3) classifies against
    * the grown index. Output = both deltas' verdicts.
    */
  def incrementalDeltaSql(minEst: Double): String =
    s"""WITH ${sigCtes("documents")},
       |hkeys AS MATERIALIZED (
       |  SELECT md5($canon) AS content_key, MIN(doc_id) AS hist_id
       |  FROM documents WHERE doc_id % 4 < 2 GROUP BY 1),
       |hcap AS MATERIALIZED (
       |  SELECT doc_id, band, bh FROM (
       |    SELECT doc_id, band, bh, count(*) OVER (PARTITION BY band, bh) AS n
       |    FROM banded WHERE doc_id % 4 < 2)
       |  WHERE n <= 1000),
       |${classifyCtes("d1", "doc_id % 4 = 2", "hkeys", "hcap", minEst)},
       |nov1 AS MATERIALIZED (SELECT doc_id FROM d1v WHERE verdict = 'novel'),
       |novkeys AS MATERIALIZED (
       |  SELECT md5($canon) AS content_key, MIN(doc_id) AS hist_id
       |  FROM documents JOIN nov1 USING (doc_id) GROUP BY 1),
       |keys2 AS MATERIALIZED (SELECT * FROM hkeys UNION ALL SELECT * FROM novkeys),
       |novbands AS MATERIALIZED (
       |  SELECT doc_id, band, bh FROM (
       |    SELECT doc_id, band, bh, count(*) OVER (PARTITION BY band, bh) AS n
       |    FROM banded JOIN nov1 USING (doc_id))
       |  WHERE n <= 1000),
       |bands2 AS MATERIALIZED (SELECT * FROM hcap UNION ALL SELECT * FROM novbands),
       |${classifyCtes("d2", "doc_id % 4 = 3", "keys2", "bands2", minEst)}
       |SELECT * FROM (
       |  SELECT 1 AS delta, doc_id, verdict, CAST(match_id AS BIGINT) AS match_id FROM d1v
       |  UNION ALL
       |  SELECT 2 AS delta, doc_id, verdict, CAST(match_id AS BIGINT) AS match_id FROM d2v)
       |ORDER BY delta, doc_id""".stripMargin

  /** Full dedup_minhash oracle (whole-corpus candidates at est >= 0.5). */
  lazy val minhashSql: String =
    s"""WITH ${minhashCtes("documents", 0.5)}
       |SELECT doc_a, doc_b, est_jaccard FROM mh ORDER BY doc_a, doc_b""".stripMargin

  /** CTE chain for the (bands, rows) S-curve sweep: ONE signature pass
    * (`sg`/`sk` from sigCtes), then per band count b in `configs` a
    * banded/capped/pairs/est chain at rows = 128/b — the band seeds are
    * Spark-XXH64 hashInt values precomputed per band index, exactly as
    * the fixed-16 `banded` CTE does. Ends in relation
    * `sweep`(bands, doc_a, doc_b, est_jaccard) holding ALL capped
    * band-collision candidates (unfiltered by est) of every config.
    */
  def bandingSweepCtes(src: String, configs: Seq[Int]): String = {
    require(configs.forall(b => K % b == 0), s"each band count must divide $K")
    val perConfig = configs.map { bands =>
      val rows = K / bands
      val seeds = (0 until bands).map(b => s"CAST(${xxhInt(b, Seed)} AS UBIGINT)").mkString(", ")
      val bh = signed(
        s"list_reduce([([$seeds])[band+1]] || sig[band*$rows+1 : band*$rows+$rows], " +
          s"(a, c) -> ${hashLong("c", "a")})")
      s"""bnd$bands AS MATERIALIZED (
         |  SELECT doc_id, band, $bh AS bh
         |  FROM sg, (SELECT unnest(range($bands)) AS band)),
         |cap$bands AS MATERIALIZED (
         |  SELECT doc_id, band, bh FROM (
         |    SELECT doc_id, band, bh, count(*) OVER (PARTITION BY band, bh) AS n FROM bnd$bands)
         |  WHERE n <= 1000),
         |prs$bands AS MATERIALIZED (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM cap$bands l JOIN cap$bands r USING (band, bh)
         |  WHERE l.doc_id < r.doc_id)""".stripMargin
    }
    val union = configs
      .map(b => s"SELECT $b AS bands, doc_a, doc_b FROM prs$b")
      .mkString("\n  UNION ALL ")
    s"""${sigCtes(src)},
       |${perConfig.mkString(",\n")},
       |sweep AS MATERIALIZED (
       |  SELECT u.bands, u.doc_a, u.doc_b,
       |    CAST(list_sum(list_transform(range(1, 129),
       |      i -> CASE WHEN a.sk[i] = b.sk[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 128 AS est_jaccard
       |  FROM ($union) u
       |  JOIN sk a ON a.doc_id = u.doc_a
       |  JOIN sk b ON b.doc_id = u.doc_b)""".stripMargin
  }

  /** Spark xxhash64(word, 42) for ASCII words < 32 bytes (UBIGINT result).
    * Bound vars: cs = char-code list, L = word length.
    */
  private def wordXxh64Sql: String = {
    val h0 = s"CAST(${BigInt(42) + P5} + L AS UBIGINT)"
    val pow256 = (0 until 8).map(i => BigInt(256).pow(i))
    val le8 = "CAST(list_sum(list_transform(range(8), i -> cs[j*8+i+1] * CAST(" +
      s"[${pow256.mkString(",")}][i+1] AS UBIGINT))) AS UBIGINT)"
    val chunks = s"list_transform(range(L // 8), j -> $le8)"
    def step8(a: String, k: String) =
      addmod(wrapmul(rotl(s"xor($a, ${wrapmul(rotl(wrapmul(k, P2), 31), P1)})", 27), P1), P4)
    val h1 = s"list_reduce([$h0] || ($chunks), (a8, k8) -> ${step8("a8", "k8")})"
    val le4 = "CAST(list_sum(list_transform(range(4), i -> cs[(L // 8)*8+i+1] * CAST(" +
      s"[${pow256.take(4).mkString(",")}][i+1] AS UBIGINT))) AS UBIGINT)"
    def step4(a: String) =
      addmod(wrapmul(rotl(s"xor($a, ${wrapmul(le4, P1)})", 23), P2), P3)
    val h2 = let(h1)(a => s"CASE WHEN L % 8 >= 4 THEN ${step4(a)} ELSE $a END")
    val tail = "cs[(L // 8)*8 + (CASE WHEN L % 8 >= 4 THEN 4 ELSE 0 END) + 1 : L]"
    def stepB(a: String, c: String) =
      wrapmul(rotl(s"xor($a, ${wrapmul(c, P5)})", 11), P1)
    val h3 = s"list_reduce([$h2] || ($tail), (ab, cb) -> ${stepB("ab", "cb")})"
    val f1 = wrapmul(xorShr(h3, 33), P2)
    val f2 = wrapmul(xorShr(f1, 29), P3)
    xorShr(f2, 32)
  }

  /** Full dedup_simhash oracle: xxhash64 word tokens -> 64-bit Charikar
    * sketch -> 4x16-bit bands -> pairs with hamming <= 3. Bit-exact.
    */
  lazy val simhashSql: String = {
    val wh = "list_transform([length(wd)], L -> " +
      "list_transform([list_transform(range(1, L + 1), ci -> CAST(unicode(wd[ci]) AS UBIGINT))], cs -> " +
      wordXxh64Sql + ")[1])[1]"
    val powers = (0 until 64).map(b => BigInt(1) << b).mkString(",")
    val bits = "CAST(CAST(list_sum(list_transform(range(64), b -> " +
      "CASE WHEN 2 * list_sum(list_transform(whs, h -> CAST((h >> b) & 1 AS BIGINT))) > len(whs) " +
      s"THEN CAST([$powers][b+1] AS HUGEINT) ELSE 0 END)) AS HUGEINT) " +
      "& 18446744073709551615 AS UBIGINT)"
    s"""WITH d0 AS (SELECT doc_id, $words AS w FROM documents),
       |dw AS MATERIALIZED (
       |  SELECT doc_id, list_transform(w, wd -> $wh) AS whs
       |  FROM d0 WHERE len(w) > 0),
       |sm AS (SELECT doc_id, $bits AS shu FROM dw),
       |banded AS (
       |  SELECT doc_id, shu, band, CAST((shu >> (16 * band)) & 65535 AS BIGINT) AS bh
       |  FROM sm, (SELECT unnest(range(4)) AS band)),
       |prs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |    CAST(bit_count(xor(l.shu, r.shu)) AS INT) AS hamming
       |  FROM banded l JOIN banded r USING (band, bh)
       |  WHERE l.doc_id < r.doc_id)
       |SELECT doc_a, doc_b, hamming FROM prs
       |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
  }
  /** Low-6-bit feature bucket of the canonical word bound as `wd` —
    * text.QualityModel.bucket's xxhash64 kernel, bit-exact. Composable:
    * the quality-model fit AND score oracles both hash with this.
    */
  lazy val wordBucketSql: String = {
    s"CAST(($wordHashExprSql) % 64 AS INT)"
  }

  /** xxhash64 of the canonical word bound as `wd` (UBIGINT) — public
    * for per-word-hash composition: the CDC chunk-boundary mask
    * (`text_cdc_chunks`) tests its low bits against zero, bit-exactly
    * mirroring Spark's `xxhash64(word)` (seed 42).
    */
  lazy val wordXxhSql: String = wordHashExprSql

  /** xxhash64 of the canonical word bound as `wd` (UBIGINT). */
  private lazy val wordHashExprSql: String =
    "list_transform([length(wd)], L -> " +
      "list_transform([list_transform(range(1, L + 1), ci -> CAST(unicode(wd[ci]) AS UBIGINT))], cs -> " +
      wordXxh64Sql + ")[1])[1]"

  /** ±1 sign from bit 6 of the word xxhash64 — the sign hash of
    * feature hashing (Weinberger et al. 2009), one bit above
    * [[wordBucketSql]]'s low-6 bucket so the two are independent.
    */
  lazy val wordSignSql: String =
    s"CASE WHEN (($wordHashExprSql) >> 6) & 1 = 1 THEN -1 ELSE 1 END"

  /** `d0(doc_id, w: varchar[])` — doc_id + canonical words list over
    * `documents`, the shared head of the quality-model oracles.
    */
  val docWordsCte: String = s"d0 AS MATERIALIZED (SELECT doc_id, $words AS w FROM documents)"

  /** q_approx_distinct oracle: Spark's HyperLogLogPlusPlus estimator
    * reproduced in SQL. Registers come from the hashLong kernel (seed
    * 42); zInverse is a sum of dyadic rationals 2^-rho, which is EXACT
    * in double arithmetic for realistic register values, so the SQL
    * aggregation is order-independent; the bias correction mirrors
    * estimateBias's 6-nearest-neighbor sliding window, with the
    * estimator tables (public HLL++ paper constants) read from Spark's
    * own HyperLogLogPlusPlusHelper so they can never drift from the
    * engine. p = 9 follows from the default relativeSD 0.05 via the
    * same ceil(2*log2(1.106/rsd)) formula as the Spark constructor.
    */
  lazy val approxDistinctSql: String = {
    val rsd = 0.05
    val p = math.ceil(2.0d * math.log(1.106d / rsd) / math.log(2.0d)).toInt
    val m = 1 << p
    val kNN = org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper.K
    val raw = org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    val bias = org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)
    val thresh = org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4)
    val nRaw = raw.length
    // same associativity as the Spark constructor: ((a/(1+b/m))*m)*m
    val alphaM2 = 0.7213d / (1.0d + 1.079d / m) * m * m
    val rawList = raw.mkString("[", ",", "]")
    val biasList = bias.mkString("[", ",", "]")
    val hx = hashLong("user_id", "CAST(42 AS UBIGINT)")
    s"""WITH hx AS (
       |  SELECT event_type, $hx AS x
       |  FROM (SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL)),
       |rr AS (
       |  SELECT event_type, CAST(x >> ${64 - p} AS INT) AS reg,
       |    65 - length(bin(((x % ${BigInt(1) << (64 - p)}) * ${1 << p}) | ${1 << (p - 1)})) AS rho
       |  FROM hx),
       |regs AS (SELECT event_type, reg, MAX(rho) AS mr FROM rr GROUP BY event_type, reg),
       |ag AS (
       |  SELECT event_type,
       |    SUM(1.0 / power(2.0, mr)) + ($m - COUNT(*)) * 1.0 AS zi,
       |    CAST($m - COUNT(*) AS DOUBLE) AS V
       |  FROM regs GROUP BY event_type),
       |eb AS (SELECT event_type, V, $alphaM2 / zi AS E FROM ag),
       |bs AS (
       |  SELECT event_type, V, E,
       |    list_transform([GREATEST(len(list_filter($rawList, rx -> rx < E)) - $kNN + 1, 0)], lw0 ->
       |      list_transform([LEAST(lw0 + $kNN, $nRaw)], hg0 ->
       |        list_transform([COALESCE(list_filter(range($nRaw),
       |            t -> hg0 + t >= $nRaw
       |              OR (E - ($rawList)[hg0+t+1]) * (E - ($rawList)[hg0+t+1])
       |                 >= (E - ($rawList)[lw0+t+1]) * (E - ($rawList)[lw0+t+1]))[1], 0)], sft ->
       |          list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ($biasList)[lw0+sft+1 : hg0+sft]), (a, b) -> a + b)
       |            / (hg0 - lw0))[1])[1])[1] AS bias
       |  FROM eb),
       |fin AS (
       |  SELECT event_type, V, E, CASE WHEN E < 5.0 * $m THEN E - bias ELSE E END AS est FROM bs),
       |hh AS (
       |  SELECT event_type, est,
       |    CASE WHEN V > 0 THEN $m.0 * ln($m.0 / V) ELSE est END AS H FROM fin),
       |res AS (
       |  SELECT event_type,
       |    CAST(floor((CASE WHEN H <= $thresh THEN H ELSE est END) + 0.5) AS BIGINT) AS approx_users
       |  FROM hh)
       |SELECT r.event_type, r.approx_users, e.exact_users
       |FROM res r JOIN (
       |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
       |  FROM events GROUP BY event_type) e USING (event_type)
       |ORDER BY event_type""".stripMargin
  }
}
