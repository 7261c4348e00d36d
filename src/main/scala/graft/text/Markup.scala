package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup + boilerplate stripping — the stage a web-crawl corpus
  * passes through BEFORE any of the text family runs (Gopher gates,
  * dedup, tokenization all assume clean text; a crawl document is
  * markup first). Re-expresses the standard extraction pipeline
  * (trafilatura/jusText-style chrome removal + tag strip + entity
  * decode) as pure `regexp_replace`/`replace` column expressions: fully
  * codegen'd, map-side, zero shuffles, and mirrored operator-for-
  * operator by the DuckDB oracle.
  *
  * Pipeline order is load-bearing and spec-pinned (MarkupSpec):
  *   1. chrome CONTAINERS are removed WITH their content (head, script,
  *      style, nav, footer, aside, and `<div class="ads">` — the
  *      known-boilerplate containers a main-content extractor drops
  *      whole, so menu/footer/tracking text never pollutes the corpus);
  *   2. remaining tags strip to spaces (h1/p/b/a markup is structure
  *      around content — the content stays);
  *   3. entities decode AFTER tag stripping, so text that literally
  *      discusses markup (`&lt;chips&gt;` → `<chips>`) survives as text
  *      instead of being re-stripped — the classic order-of-operations
  *      trap in naive strippers;
  *   4. whitespace collapses (tags became spaces) and trims.
  *
  * Limitations (documented, not hidden): containers are matched
  * non-greedily, so a NESTED same-name container (a div.ads inside a
  * div.ads) would end the match at the inner close tag; the stack-based
  * [[stripHtmlNested]] (a linear depth-counting parser,
  * [[graft.functions.StripChromeNested]]) is the nesting-correct twin —
  * use it on real crawl HTML. Chrome open tags match with a word
  * boundary (`<head\b`), so prefix-colliding names (`<header>`) are NOT
  * chrome. `&amp;` decodes LAST so double-encoded entities (`&amp;lt;`)
  * decode one level only, per the HTML spec.
  *
  * Scale: per-doc regex chains over the text column — embarrassingly
  * parallel, no state, prunes to exactly (text) at the scan.
  */
object Markup {

  /** Containers removed with their content, in application order. */
  val ChromeTags: Seq[String] = Seq("head", "script", "style", "nav", "footer", "aside")

  /** The ad-div boilerplate marker (class-targeted container removal). */
  val AdDivPattern = "(?s)<div class=\"ads\">.*?</div>"

  /** HTML entities decoded after tag strip; `&amp;` deliberately last. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Chrome containers + their content removed; tags still present.
    * `\b` after the tag name keeps `<header>`/`<navbar>`-style
    * prefix-colliding tags out of the match (ADVICE r12: `<head[^>]*>`
    * also matched `<header ...>` and over-stripped to the next
    * `</head>`); `</$t\s*>` tolerates close-tag whitespace.
    */
  def dropChrome(raw: Column): Column = {
    val noBlocks = ChromeTags.foldLeft(raw)((c, t) =>
      regexp_replace(c, s"(?s)<$t\\b[^>]*>.*?</$t\\s*>", " "))
    regexp_replace(noBlocks, AdDivPattern, " ")
  }

  /** Shared tail of the strip pipeline: tag strip -> entity decode ->
    * whitespace collapse (stages 2-4; stage 1 is one of the two chrome
    * removers).
    */
  private def stripTail(noChrome: Column): Column = {
    val noTags = regexp_replace(noChrome, "<[^>]+>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, v)) =>
      replace(c, lit(e), lit(v))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Nesting-correct full strip: the stack-based depth-counting chrome
    * parser ([[graft.functions.StripChromeNested]] — a nested div.ads
    * removes to its MATCHING close, not the first one) feeding the same
    * tag-strip/entity/whitespace tail as [[stripHtml]]. Identical to
    * stripHtml on nesting-free pages; correct where it is not.
    */
  def stripHtmlNested(raw: Column): Column =
    stripTail(graft.functions.StripChromeNested.column(raw))

  /** Full strip: chrome removal -> tag strip -> entity decode ->
    * whitespace collapse. Idempotent on markup-free text up to
    * whitespace normalization.
    */
  def stripHtml(raw: Column): Column = stripTail(dropChrome(raw))

  /** Markup tag occurrences in the raw text (pre-strip audit count). */
  def tagCount(raw: Column): Column =
    regexp_count(raw, lit("<[^>]+>")).cast("long")

  /** Encoded-entity occurrences in the raw text. */
  def entityCount(raw: Column): Column =
    regexp_count(raw, lit("&(amp|lt|gt|quot|nbsp|#39);")).cast("long")
}
