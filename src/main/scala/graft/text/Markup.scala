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
  * div.ads) would end the match at the inner close tag; real extractors
  * carry a parser for that. `&amp;` decodes LAST so double-encoded
  * entities (`&amp;lt;`) decode one level only, per the HTML spec.
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

  /** Chrome containers + their content removed; tags still present. */
  def dropChrome(raw: Column): Column = {
    val noBlocks = ChromeTags.foldLeft(raw)((c, t) =>
      regexp_replace(c, s"(?s)<$t[^>]*>.*?</$t>", " "))
    regexp_replace(noBlocks, AdDivPattern, " ")
  }

  /** Full strip: chrome removal -> tag strip -> entity decode ->
    * whitespace collapse. Idempotent on markup-free text up to
    * whitespace normalization.
    */
  def stripHtml(raw: Column): Column = {
    val noTags = regexp_replace(dropChrome(raw), "<[^>]+>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, v)) =>
      replace(c, lit(e), lit(v))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Markup tag occurrences in the raw text (pre-strip audit count). */
  def tagCount(raw: Column): Column =
    regexp_count(raw, lit("<[^>]+>")).cast("long")

  /** Encoded-entity occurrences in the raw text. */
  def entityCount(raw: Column): Column =
    regexp_count(raw, lit("&(amp|lt|gt|quot|nbsp|#39);")).cast("long")
}
