package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline.
  *
  * All ops are composed from `org.apache.spark.sql.functions` (codegen'd,
  * no UDFs) so they stay inside whole-stage codegen and distribute
  * trivially: every function here is map-side only.
  *
  * Cross-engine parity: functions used by oracle-checked queries are
  * restricted to semantics that DuckDB reproduces exactly (lower/replace/
  * regexp over ASCII classes, integer length arithmetic, md5).
  */
object Text {

  /** Lowercase, strip to [a-z0-9], collapse runs of other chars to single
    * spaces, trim. The canonical form used for hashing and word counts.
    */
  def canon(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Canonical word array; empty array for blank/empty canon. */
  def words(text: Column): Column = {
    val c = canon(text)
    when(length(c) === 0, array().cast("array<string>")).otherwise(split(c, " "))
  }

  /** Keep-class for the MULTILINGUAL canon: Latin alnum plus the six
    * planted script ranges, spliced from [[scriptRanges]] so the canon
    * and the language-ID cascade can never disagree on coverage.
    * Explicit `\x{hhhh}` ranges (not `\p{L}`) on purpose: they parse
    * identically in Java regex and RE2 and carry no Unicode-version
    * dependence — the cross-engine-parity rule this file opens with.
    * All ranges are BMP, so Java char iteration == codepoint iteration
    * for every symbol the BPE fit can see.
    */
  lazy val uniCanonClass: String = // lazy: scriptRanges declares below
    "a-z0-9" + scriptRanges.map { case (_, r) => r.drop(1).dropRight(1) }.mkString

  /** Multilingual canon: lowercase, keep [[uniCanonClass]], collapse
    * runs of everything else to single spaces, trim. `_` is outside the
    * keep-class, so the BPE boundary marker can never collide with
    * content (the [[graft.text.Bpe.units]] invariant).
    *
    * Implemented as the one-pass [[graft.functions.CanonUni]]
    * expression, NOT `trim(regexp_replace(lower(..), class, ' '))`: a
    * negated Java-regex class with unicode ranges loses the ASCII
    * BitClass fast path and measured 12× slower on the corpus
    * dictionary pass (CanonUniSpec pins regex ≡ expression on the
    * gated content).
    */
  def canonUni(text: Column): Column =
    graft.functions.CanonUni.column(text)

  /** Multilingual canonical word array; empty for blank canon. */
  def wordsUni(text: Column): Column = {
    val c = canonUni(text)
    when(length(c) === 0, array().cast("array<string>")).otherwise(split(c, " "))
  }

  /** Multilingual word count via the same length arithmetic as
    * [[wordCount]] (codepoint semantics in BOTH engines: Spark `length`
    * and DuckDB `length` count codepoints, not bytes).
    */
  def wordCountUni(text: Column): Column = {
    val c = canonUni(text)
    when(length(c) === 0, lit(0L))
      .otherwise((length(c) - length(replace(c, lit(" "), lit(""))) + 1).cast("long"))
  }

  /** Word count via length arithmetic (exactly reproducible in SQL:
    * no split-semantics edge cases).
    */
  def wordCount(text: Column): Column = {
    val c = canon(text)
    when(length(c) === 0, lit(0L))
      .otherwise((length(c) - length(replace(c, lit(" "), lit(""))) + 1).cast("long"))
  }

  /** Occurrence count of `word` as a whole word in the canonical text.
    * Non-overlapping left-to-right (same in Spark and DuckDB `replace`).
    */
  def wordOcc(text: Column, word: String): Column = {
    val padded = concat(lit(" "), canon(text), lit(" "))
    val needle = " " + word + " "
    ((length(padded) - length(replace(padded, lit(needle), lit("")))) / lit(needle.length))
      .cast("long")
  }

  /** Word k-shingles of the canonical text, joined by single spaces.
    * Shorter-than-k documents yield one shingle = the whole text.
    *
    * The words array is bound ONCE via a single-element-array transform
    * (a let-binding): referencing the raw `words(text)` subtree inside
    * the shingle lambda would re-evaluate the regex+split per shingle —
    * a ~300x slowdown measured on 500-char documents.
    */
  def shingles(text: Column, k: Int = 3): Column =
    element_at(
      transform(array(words(text)), w => shinglesOfWords(w, k)), 1)

  /** Shingles from an already-materialized words array column. */
  def shinglesOfWords(w: Column, k: Int): Column =
    when(size(w) === 0, array().cast("array<string>"))
      .when(size(w) <= k, array(array_join(w, " ")))
      .otherwise(
        transform(sequence(lit(0), size(w) - k), i => array_join(slice(w, i + 1, lit(k)), " ")))

  /** xxhash64 of each element of a string array (map-side, codegen'd). */
  def hashedArray(arr: Column): Column = transform(arr, s => xxhash64(s))

  /** Stopword sets per language for the n-gram/stopword language-ID
    * heuristic. Chosen to be SQL-countable (whole-word occurrences).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "was", "that", "with"),
    "de" -> Seq("der", "und", "die", "nicht", "das"),
    "es" -> Seq("el", "que", "los", "una", "para"),
    "fr" -> Seq("le", "les", "des", "est", "dans")
  )

  /** Per-language stopword score columns, aliased `score_<lang>`. */
  def langScores(text: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, ws) =>
      lang -> ws.map(w => wordOcc(text, w)).reduce(_ + _)
    }

  /** Predicted language: deterministic cascade — each language wins if its
    * score is positive and >= every *later* language's score; declaration
    * order (en, de, es, fr) breaks ties. Mirrored 1:1 by the oracle SQL's
    * CASE chain.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    scores.indices.foldRight(lit("und")) { case (i, els) =>
      val (lang, s) = scores(i)
      val later = scores.drop(i + 1).map(_._2)
      val cond =
        if (later.isEmpty) s > lit(0)
        else s > lit(0) && s >= later.reduce((a, b) => greatest(a, b))
      when(cond, lit(lang)).otherwise(els)
    }
  }

  /** Unicode-script ranges for the script-first language ID, as
    * `[\x{hhhh}-\x{hhhh}]` character classes — the ONE range syntax
    * Java regex and RE2 both parse, so the oracle uses the identical
    * pattern string. Script → language is a heuristic (Cyrillic → ru,
    * Greek → el, Han → zh): honest for a coarse corpus router, and the
    * eval key publishes the confusion matrix rather than hiding it.
    */
  val scriptRanges: Seq[(String, String)] = Seq(
    "ru" -> "[\\x{0400}-\\x{04FF}]", // Cyrillic
    "el" -> "[\\x{0370}-\\x{03FF}]", // Greek
    "zh" -> "[\\x{4E00}-\\x{9FFF}]", // CJK Unified Ideographs
    "ar" -> "[\\x{0600}-\\x{06FF}]", // Arabic
    "hi" -> "[\\x{0900}-\\x{097F}]", // Devanagari
    "ko" -> "[\\x{AC00}-\\x{D7AF}]") // Hangul syllables

  /** Per-script character counts, aliased by predicted language. */
  def scriptCounts(text: Column): Seq[(String, Column)] =
    scriptRanges.map { case (lang, r) =>
      lang -> regexp_count(text, lit(r)).cast("long")
    }

  /** Whole-word occurrence count over an ALREADY-PADDED canonical
    * column (`' ' || canon || ' '`) — the length-arithmetic probe of
    * [[wordOcc]] with the padded input factored out, so a 20-probe
    * cascade binds the canon chain ONCE instead of generating 20 copies
    * of it (the 64 KB-method ceiling janino enforces).
    */
  def occInPadded(padded: Column, word: String): Column = {
    val needle = " " + word + " "
    ((length(padded) - length(replace(padded, lit(needle), lit("")))) / lit(needle.length))
      .cast("long")
  }

  /** The [[langId]] cascade over a pre-bound padded-canonical column. */
  private def langIdFromPadded(padded: Column): Column = {
    val scores = stopwords.map { case (lang, ws) =>
      lang -> ws.map(w => occInPadded(padded, w)).reduce(_ + _)
    }
    scores.indices.foldRight(lit("und")) { case (i, els) =>
      val (lang, s) = scores(i)
      val later = scores.drop(i + 1).map(_._2)
      val cond =
        if (later.isEmpty) s > lit(0)
        else s > lit(0) && s >= later.reduce((a, b) => greatest(a, b))
      when(cond, lit(lang)).otherwise(els)
    }
  }

  /** Script-first language ID: the dominant script range wins when any
    * script characters are present (same positive-and->=-later cascade
    * as [[langId]], declaration order ru/el/zh breaking ties); a
    * Latin-only document falls through to the stopword heuristic.
    * Code-switched text classifies by script PRESENCE — a Latin doc
    * with a Cyrillic tail is 'ru', which is what a contamination
    * router wants.
    *
    * Both the raw text and the padded canon are LET-BOUND via the
    * single-element-array transform idiom (see [[shingles]]): the
    * cascade references its input ~28 times, and inlining a planted
    * CASE or the canon regex chain into every reference blew the
    * generated method past janino's 64 KB limit — the whole stage fell
    * back to interpreted (measured 2.9 s vs sub-second at sf0.1). The
    * script counts run on the RAW text (canon strips non-Latin
    * characters), the stopword fallback on the bound padded canon.
    */
  def langIdScript(text: Column): Column =
    element_at(transform(array(text), t =>
      element_at(transform(array(concat(lit(" "), canon(t), lit(" "))), p => {
        val sc = scriptRanges.map { case (lang, r) =>
          lang -> regexp_count(t, lit(r)).cast("long")
        }
        sc.indices.foldRight(langIdFromPadded(p)) { case (i, els) =>
          val (lang, c) = sc(i)
          val later = sc.drop(i + 1).map(_._2)
          val cond =
            if (later.isEmpty) c > lit(0L)
            else c > lit(0L) && c >= later.reduce((a, b) => greatest(a, b))
          when(cond, lit(lang)).otherwise(els)
        }
      }), 1)), 1)

  /** Punctuation character count (chars outside [a-zA-Z0-9 ]). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("long")

  /** Composite quality score in [0, 1]: length (capped at 200 words,
    * weight .5) + lexical diversity (unique/total words, .3) + inverse
    * punctuation density (.2). The exact arithmetic shape is mirrored by
    * the text_quality / dedup_survivors oracles — keep them in lockstep.
    */
  def qualityScore(text: Column): Column = {
    val wc = wordCount(text)
    val uniq = when(size(words(text)) === 0, lit(0L))
      .otherwise(size(array_distinct(words(text))).cast("long"))
    val punct = punctCount(text)
    val nchars = length(text).cast("long")
    (least(wc, lit(200L)) / lit(200L)) * lit(0.5) +
      when(wc === 0L, lit(0.0)).otherwise(uniq / wc) * lit(0.3) +
      when(nchars === 0L, lit(0.0)).otherwise(lit(1.0) - punct / nchars) * lit(0.2)
  }

  /** BPE-ish token count: letter runs, single digits, single symbols.
    * The regex dialect subset (alternation + ASCII classes) behaves
    * identically in Java regex and DuckDB's RE2.
    */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0))).cast("long")

  /** Whitespace/case normalization for ingest: lowercase, collapse all
    * whitespace runs (space, tab, newline, CR) to single spaces, trim.
    * Unlike `canon` it PRESERVES punctuation — this is the lossless-ish
    * cleanup pass a corpus gets before quality scoring, where `canon` is
    * the lossy canonical form used for hashing.
    */
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(lower(text), "[ \\t\\n\\r]+", " "))

  /** PII scrubbing: replace email addresses and long digit runs with
    * typed placeholder tokens. Patterns restricted to constructs that
    * behave identically in Java regex and DuckDB RE2 (character classes,
    * bounded repetition, no backrefs/lookarounds).
    */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
  val longDigitsPattern = "[0-9][0-9][0-9][0-9][0-9][0-9]+"
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      longDigitsPattern, "<NUM>")

  /** Exact content fingerprint of the canonical text (cross-engine md5). */
  def fingerprintMd5(text: Column): Column = md5(canon(text).cast("binary"))

  /** 64-bit sketch fingerprint: min xxhash64 over word 3-shingles —
    * a 1-permutation minhash, usable as a cheap near-dup prefilter.
    */
  def sketch64(text: Column): Column = array_min(hashedArray(shingles(text, 3)))
}
