package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, stratified, repartition-stable sampling.
  *
  * `rand()`-based sampling is neither reproducible across retries nor
  * stable under repartitioning — a training-data pipeline needs the SAME
  * sample on every run and every cluster layout. Instead each row's fate
  * is a pure function of its key: the first byte-pair of md5(key) is
  * compared against a per-stratum hex threshold, so the sample is exact,
  * shuffle-free (map-side filter), and reproducible in any engine with
  * md5 (the oracle mirrors it 1:1 in DuckDB).
  */
object Sample {

  /** Keep a row iff substring(md5(key), 1, 2) < threshold(stratum).
    * `rates` maps stratum value -> admission fraction in [0,1]; rows in
    * strata absent from `rates` get `defaultRate`. Fractions quantize to
    * 1/256 steps (two hex chars).
    */
  def stratified(
      df: DataFrame,
      keyCol: Column,
      stratumCol: Column,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    def hexThreshold(rate: Double): String = {
      val steps = math.max(0, math.min(256, math.round(rate * 256))).toInt
      // 256 steps = keep everything: use a sentinel above any hex pair
      // ("%02x" of 256 would be the 3-char "100", which string-compares
      // BELOW "ab" and would keep nothing).
      if (steps == 256) "g" else f"$steps%02x"
    }
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (els, (stratum, rate)) =>
        when(stratumCol === stratum, lit(hexThreshold(rate))).otherwise(els)
    }
    df.where(substring(md5(keyCol.cast("string")), 1, 2) < threshold)
  }

  /** Exact-quota sampling: the first `n` rows per stratum in md5-of-key
    * order — deterministic, repartition-stable, and exactly sized (where
    * rate-based sampling only hits the quota in expectation). One
    * shuffle on the stratum (window), bounded output.
    */
  def quotaPerStratum(
      df: DataFrame,
      keyCol: Column,
      stratumCol: Column,
      n: Int): DataFrame = {
    require(n > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(md5(keyCol.cast("string")), keyCol) // key tiebreak for md5 ties
    // collision-checked temp column: a plain "__rn" would silently
    // replace (and then drop) a caller column of the same name
    val rn = "__graft_quota_rn"
    require(!df.columns.contains(rn), s"input already has a $rn column")
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) <= n)
      .drop(rn)
  }
  /** Per-domain document cap: keep the top `n` documents of each source
    * domain ranked by canonical word count (quality proxy; doc_id
    * tiebreak) — the anti-spam stage that stops one viral domain from
    * dominating a training corpus. Routed through the bounded-heap
    * TopKPerKey operator rather than a row_number window: a viral
    * domain would make the window's partition-by a hot key (every one
    * of its documents in one task), where the two-phase heaps cap
    * per-task state at domains x n and bound the shuffle the same way.
    */
  def domainCap(docs: DataFrame, n: Int): DataFrame = {
    require(n > 0)
    val scored = docs
      .where(col("text").isNotNull)
      .select(
        col("doc_id"),
        col("source"),
        graft.text.Text.wordCount(col("text")).as("wc"))
    graft.plans.TopK.perKey(scored, Seq("source"), Seq("wc" -> true, "doc_id" -> false), n)
  }

  /** Token-budget corpus mixing: per mixture key (source), admit docs in
    * deterministic doc_id order while the running token total BEFORE the
    * doc stays under that key's budget — the greedy weighted-mix step of
    * training-data assembly (each source's budget = its mixture weight ×
    * the token target).
    *
    * Skew-safe two-level prefix sum: a naive
    * `sum over (partition by source order by doc_id)` serializes each
    * source onto one task. Instead: (1) docs bucket by
    * `doc_id div bucketSize` (unique ids → ≤ bucketSize rows per
    * (source, bucket)); (2) bucket subtotals via skew-free groupBy;
    * (3) the prefix scan runs over the TINY (source × bucket) subtotal
    * frame, broadcast back; (4) within-bucket prefix windows are bounded
    * at bucketSize rows. No window ever sees more than bucketSize rows
    * or the subtotal frame.
    */
  def tokenMix(
      docs: DataFrame,
      key: String,
      idCol: String,
      tokens: Column,
      budgets: Map[String, Double],
      bucketSize: Long = 4096L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val b = docs
      .select(col(key), col(idCol), tokens.as("toks"))
      .withColumn("__bucket", expr(s"$idCol div $bucketSize"))
    val sub = b.groupBy(key, "__bucket").agg(sum("toks").as("__btoks"))
    val boff = sub.withColumn(
      "__boff",
      coalesce(
        sum("__btoks").over(
          w.partitionBy(key).orderBy("__bucket").rowsBetween(Long.MinValue, -1)),
        lit(0L)))
    val inBucket = w.partitionBy(key, "__bucket").orderBy(idCol)
      .rowsBetween(Long.MinValue, -1)
    val budget = budgets.foldLeft(lit(Double.NegativeInfinity)) {
      case (acc, (s, bud)) => when(col(key) === s, lit(bud)).otherwise(acc)
    }
    b.join(broadcast(boff.select(col(key), col("__bucket"), col("__boff"))),
        Seq(key, "__bucket"))
      .withColumn(
        "cum_before", col("__boff") + coalesce(sum("toks").over(inBucket), lit(0L)))
      .where(col("cum_before") < budget)
      .select(col(key), col(idCol), col("toks"), col("cum_before"))
  }

  /** Deterministic stratified train/val/test assignment with per-split
    * accounting. Each row's split is a pure function of its id —
    * bucket = (SplitMix64(id) >>> 32) mod 100, train if bucket < trainPct,
    * val if < trainPct+valPct, else test — so the split is reproducible
    * across runs, retries, and cluster layouts, and any engine with the
    * same mixer assigns identically (the oracle mirrors the mixer in
    * SQL). The top 32 hash bits feed the modulo so the bucket math runs
    * on a value both signed and unsigned arithmetic agree on.
    *
    * Output is the ACCOUNTING frame (source × split: docs, tokens, doc
    * fraction), the artifact a curation run records; per-row assignment
    * is the same expression applied at write time. One map-side hash +
    * one groupBy on (source, split) — the window for docs_frac runs on
    * the tiny aggregated frame (|sources| × 3 rows).
    */
  /** Deterministic split label of an id: SplitMix64(id) >>> 32 mod 100
    * into 'train'/'val'/'test' bands — the shared assignment primitive
    * behind [[hashSplit]] and the leakage audit (the SAME function must
    * label both, or the audit audits a different split than the one
    * shipped).
    */
  def splitOf(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Mix64Long(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(id)))
    val bucket = shiftrightunsigned(h, 32) % lit(100L)
    when(bucket < trainPct.toLong, lit("train"))
      .when(bucket < (trainPct + valPct).toLong, lit("val"))
      .otherwise(lit("test"))
  }

  def hashSplit(
      docs: DataFrame,
      idCol: String,
      srcCol: String,
      tokens: Column,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"hashSplit: need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100; got $trainPct/$valPct")
    val split = splitOf(col(idCol), trainPct, valPct)
    val g = docs
      .select(col(srcCol).as("source"), split.as("split"), tokens.as("toks"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    g.withColumn("docs_frac",
      col("n_docs").cast("double") / sum("n_docs").over(w).cast("double"))
  }

  /** Temperature-reweighted source mixing: the per-source token budgets
    * are FIT from the corpus instead of handed in. With temperature
    * α = 0.5 (the standard multilingual-LM rebalancing trick: sample
    * p_s ∝ share_s^α so head sources are de-emphasized and tail sources
    * up-weighted), each source's budget is
    *
    *   budget_s = (sqrt(share_s) / Σ_t sqrt(share_t)) × budgetFrac × T
    *
    * where share_s = tokens_s / T. α is FIXED at 0.5 because sqrt is
    * IEEE-754 correctly-rounded in both the JVM and DuckDB — pow(x, α)
    * for general α is not, and would break bit-exact oracle parity.
    * The normalizer Σ sqrt(share) is a LEFT FOLD in source-name order
    * (binary/UTF8 ordering), mirrored by the oracle's list_reduce over
    * list(... ORDER BY source): double addition is order-sensitive, so
    * both engines must fold identically.
    *
    * Scale: the only driver-side state is one row per SOURCE (bounded by
    * the catalog of sources, not the corpus); selection then rides
    * `tokenMix`'s two-level bounded-window prefix sums. Output = the
    * selected (source, doc, tokens, cum_before) rows.
    */
  def temperatureMix(
      docs: DataFrame,
      key: String,
      idCol: String,
      tokens: Column,
      budgetFrac: Double,
      bucketSize: Long = 4096L): DataFrame = {
    val toks = docs.select(col(key), col(idCol), tokens.as("toks"))
    // Bounded collect: one (source, total) row per source.
    val totals = toks.groupBy(key).agg(sum("toks").as("t"))
      .orderBy(key).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val grand = totals.map(_._2).sum
    require(grand > 0, s"temperatureMix: corpus has no tokens under '$key'")
    val sq = totals.map { case (s, t) => s -> math.sqrt(t.toDouble / grand) }
    val z = sq.map(_._2).foldLeft(0.0)(_ + _)
    val budgets = sq.map { case (s, w) =>
      s -> (w / z) * (budgetFrac * grand)
    }.toMap
    tokenMix(docs, key, idCol, tokens, budgets, bucketSize)
  }

  /** Sequential Poisson sampling (Ohlsson 1998): a fixed-size
    * weighted-without-replacement sample per stratum. Each row's rank is
    *
    *   xi = u / w,  u = (SplitMix64(id) >>> 32) + 1  in [1, 2^32]
    *
    * and the `n` SMALLEST ranks per stratum win — inclusion probability
    * approximates proportional-to-size (the classic survey-sampling
    * order-sampling scheme). The scheme is chosen over
    * Efraimidis–Spirakis u^(1/w) deliberately: u and w are exact
    * integers and the rank is ONE IEEE-754 division (correctly rounded
    * in every engine), where pow()/exp() are not cross-engine
    * bit-stable. Deterministic, repartition-stable, reproducible.
    *
    * Scale: ranking is map-side arithmetic; selection routes through the
    * bounded-heap TopKPerKey operator, so per-task state is
    * strata × n and a stratum holding most of the corpus never
    * concentrates a window partition.
    */
  def poissonSample(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      weight: Column,
      n: Int): DataFrame = {
    require(n > 0, s"poissonSample: need n > 0, got $n")
    val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Mix64Long(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col(idCol))))
    val u = shiftrightunsigned(h, 32) + lit(1L)
    val scored = docs
      .select(col(stratumCol).as("stratum"), col(idCol), weight.as("w"))
      .where(col("w") > 0L)
      .withColumn("rank", u.cast("double") / col("w").cast("double"))
    graft.plans.TopK.perKey(
      scored, Seq("stratum"), Seq("rank" -> false, idCol -> false), n)
  }

  /** Water-filling token-budget allocation across strata: given each
    * stratum's available token mass and a global budget B (a fixed
    * numer/denom fraction of the corpus total), find the common cap c
    * with Σ min(avail_i, c) ≤ B — small sources keep everything, large
    * ones are levelled to c. This DERIVES the per-source cap from the
    * budget, where [[tokenMix]] takes fixed weights and [[domainCap]]
    * a fixed per-domain doc count; it is the "give me N tokens total
    * with no source dominating" curation primitive.
    *
    * Closed form over the SORTED stratum frame (avail asc, key
    * tiebreak): stratum i is fully taken iff
    * `avail_i·(n−i+1) + prefix_{i−1} ≤ B` (the standard monotone
    * feasibility test — passing rows form a prefix), k = count of
    * passing rows, cap = (B − prefix_k) div (n−k). All-integer
    * (truncating division under-allocates by < n tokens, never over),
    * so the oracle mirrors it exactly.
    *
    * Scale: one corpus pass aggregates availability; everything after
    * runs windows over the BOUNDED stratum frame (metadata contract —
    * strata = sources/domains, not rows). `cap_level` is −1 when the
    * whole corpus fits (nothing capped).
    */
  def waterfillBudget(
      avail: DataFrame, key: String, availCol: String,
      budgetNumer: Long, budgetDenom: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(availCol), col(key))
    val full = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val staged = avail
      .withColumn("__idx", row_number().over(w).cast("long"))
      .withColumn("__prefix", sum(availCol).over(w)) // inclusive running sum
      .withColumn("__n", count(lit(1)).over(full))
      .withColumn("__budget", expr(s"sum($availCol) over () * $budgetNumer div $budgetDenom"))
      .withColumn("__fully",
        col(availCol) * (col("__n") - col("__idx") + 1) +
          (col("__prefix") - col(availCol)) <= col("__budget"))
    staged
      .withColumn("__k", sum(when(col("__fully"), 1L).otherwise(0L)).over(full))
      .withColumn("__pk", sum(when(col("__fully"), col(availCol)).otherwise(0L)).over(full))
      .withColumn("cap_level",
        when(col("__k") === col("__n"), lit(-1L))
          .otherwise(expr("(__budget - __pk) div (__n - __k)")))
      .select(col(key), col(availCol).as("avail_toks"),
        when(col("__k") === col("__n") || col("__fully"), col(availCol))
          .otherwise(least(col(availCol), col("cap_level"))).as("alloc_toks"),
        (!col("__fully") && col("__k") < col("__n")).as("capped"),
        col("cap_level"))
  }

  /** Class-balanced downsampling: every class keeps exactly the minority
    * class's count, members selected by deterministic SplitMix64(id)
    * top-32 rank (uniform within class, repartition-stable) — the
    * label-skew corrective applied before training on imbalanced data.
    *
    * Scale: the per-class count is class metadata (one map-side-combined
    * groupBy, a single min collected); ranking is map-side arithmetic;
    * selection rides the bounded-heap TopKPerKey operator, so a 99%%
    * majority class costs (classes x n_min) heap state per task, never a
    * sort of the majority partition.
    */
  def balancedSample(docs: DataFrame, idCol: String, classCol: String): DataFrame = {
    val nMin = docs.groupBy(classCol).agg(count(lit(1)).as("n"))
      .agg(min("n")).head().getLong(0)
    val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Mix64Long(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col(idCol))))
    val scored = docs.withColumn("rk", shiftrightunsigned(h, 32))
    graft.plans.TopK.perKey(
      scored, Seq(classCol), Seq("rk" -> false, idCol -> false), nMin.toInt)
  }
}
