package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text

/** Pairwise source n-gram overlap matrix — the corpus-level redundancy
  * report that decides which sources to dedup against each other BEFORE
  * paying a full cross-source near-dup pass.
  *
  * Scale design (reference computes nothing like this; the shape is the
  * classic distinct-shingle Jaccard, e.g. Broder 1997): grams collapse
  * to 64-bit xxhash keys BEFORE any shuffle (8-byte keys, not ~50-byte
  * strings); per gram the source memberships roll up into one bitmask
  * word per 64 sources (bit i%64 of word i/64), so every pairwise
  * intersection reads off a bounded (mask-pattern → count) table — no
  * gram×gram self-join, no S² join-row term at all. The source
  * dimension is SHARDED into ⌈S/64⌉-long mask arrays (R10), so there is
  * no hard source-count cap; cost is O(grams) + distinct-patterns ×
  * pairs metadata. Distinct membership patterns are ≤ min(grams, 2^S)
  * — ≪ grams for real corpora, the documented watch item for
  * adversarial mixes.
  */
object SourceOverlap {

  /** @param docs frame with `source` (string) and `text` columns
    * @param n    shingle width in words
    * @return (src_a, src_b, n_a, n_b, inter, uni, jaccard_permille) for
    *         every unordered source pair, Jaccard in truncating permille
    */
  def matrix(docs: DataFrame, n: Int = 8): DataFrame = {
    val wSrc = Window.orderBy("source") // bounded: distinct sources
    val srcIdx = docs.select("source").distinct()
      .withColumn("idx", (row_number().over(wSrc) - 1).cast("long"))
    // r14 (guide §1.2 step 2): grams hash through the fused one-pass
    // ShingleBlock kernel (canonical words → FNV/Mix64 n-gram hashes,
    // already deduped per doc) instead of materializing every gram as a
    // STRING (words array → per-gram slice + array_join + xxhash64 —
    // measured as the dominant cost of this key). Same word canon, same
    // ≤n-words edge rule (whole text as one gram), empty docs drop on
    // both paths (null struct ≡ empty array under explode). The hash
    // never reaches the output; counts are identical modulo 64-bit
    // collisions, and the string-exact DuckDB oracle stays the gate.
    val g = docs
      .select(col("source"),
        explode(graft.functions.exprs.shingle_block(col("text"), n).getField("sh")).as("g"))
      .distinct()
    val sizes = g.groupBy("source").agg(count(lit(1)).as("n"))
    // bounded 1-value collect: the mask-array width ⌈S/64⌉
    val nWords = ((srcIdx.count() + 63) / 64).toInt.max(1)
    val masks = g.join(broadcast(srcIdx), "source")
      .select(col("g"), expr("idx div 64").as("word"),
        expr("shiftleft(1L, cast(idx % 64 as int))").as("bit"))
      .groupBy("g", "word").agg(expr("bit_or(bit)").as("m"))
      // zero-fill absent words so every gram carries a full-width array
      .groupBy("g")
      .agg(map_from_entries(collect_list(struct(col("word"), col("m")))).as("wm"))
      .select(expr(s"transform(sequence(0, ${nWords - 1}), " +
        "w -> coalesce(element_at(wm, cast(w as bigint)), 0L))").as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("cnt"))
    val pairs = srcIdx.as("x").join(srcIdx.as("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
        col("x.idx").as("ia"), col("y.idx").as("ib"))
      .withColumn("wa", expr("ia div 64"))
      .withColumn("wb", expr("ib div 64"))
    // Shard the pairs×masks product by WORD PAIR (R11, the r10 watch
    // item): a source pair only reads the two mask words its bits live
    // in, so full-width patterns first collapse to per-(wa, wb)
    // two-word patterns — at S sources that is ⌈S/64⌉² word pairs
    // (bounded metadata, broadcast) instead of S²/2 pair rows touching
    // every full pattern, and the two-word pattern tables are far
    // smaller than the full-width one (patterns that differ only in
    // other words merge). Each source pair then equi-joins ONLY its
    // word pair's patterns.
    val wordPairs = pairs.select("wa", "wb").distinct()
    val masks2 = masks.crossJoin(broadcast(wordPairs)) // patterns × ⌈S/64⌉² word pairs
      .select(col("wa"), col("wb"),
        expr("element_at(mask, cast(wa as int) + 1)").as("ma"),
        expr("element_at(mask, cast(wb as int) + 1)").as("mb"), col("cnt"))
      .groupBy("wa", "wb", "ma", "mb").agg(sum("cnt").as("cnt"))
    val both: Column =
      expr("(ma >> (ia % 64)) & 1 = 1 and (mb >> (ib % 64)) & 1 = 1")
    val inter = pairs.join(masks2, Seq("wa", "wb"))
      .groupBy("src_a", "src_b")
      .agg(sum(when(both, col("cnt")).otherwise(0L)).as("inter"))
    inter
      .join(sizes.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("inter"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard_permille", expr("inter * 1000 div uni"))
      .orderBy("src_a", "src_b")
  }
}
