package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The MULTILINGUAL canon (lowercase, keep Latin alnum + the six
  * planted script ranges, collapse runs of everything else to single
  * spaces, trim) as ONE imperative codepoint pass.
  *
  * Why an expression and not the obvious
  * `trim(regexp_replace(lower(text), "[^a-z0-9\x{0400}-…]+", " "))`:
  * the regex form is semantically right but MEASURED 12× slower than
  * the ASCII-class canon in Java regex (6.0 s vs 0.5 s for the 10×
  * corpus dictionary pass) — a negated class with supplementary unicode
  * ranges loses the BitClass fast path and the whole BPE family
  * inherited ~3-4× scale-stress ratios from it. This pass does the
  * lower + keep test + run-collapse + trim in one O(length) loop per
  * row: embarrassingly parallel map-side work, the same shape as the
  * ASCII canon.
  *
  * Semantics notes (spec-pinned equal to the regex form on the gated
  * corpora, CanonUniSpec):
  *  - lowercase is the SIMPLE per-codepoint mapping
  *    (`Character.toLowerCase`) — identical to DuckDB's utf8proc
  *    `lower` (which the oracle mirror uses), and identical to
  *    `String.toLowerCase` everywhere except locale-style multi-char
  *    expansions (final sigma, U+0130), none of which the ASCII corpus
  *    or the lowercase planted samples can produce;
  *  - keep ranges are duplicated from `graft.text.Text.scriptRanges`
  *    (the StripChromeNested precedent: the expression stays
  *    self-contained, the spec asserts the two never drift).
  */
case class CanonUni(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, TypeGuard.isString, "string")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(CanonUni.canon(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($input);"
    })
  override protected def withNewChildInternal(c: Expression): CanonUni = copy(child = c)
  override def prettyName: String = "canon_uni"
}

object CanonUni {
  /** The six planted script ranges (Cyrillic, Greek, CJK Unified,
    * Arabic, Devanagari, Hangul) — keep in lockstep with
    * `Text.scriptRanges` (CanonUniSpec pins equality).
    */
  val KeepRanges: Array[(Int, Int)] = Array(
    (0x0400, 0x04FF), (0x0370, 0x03FF), (0x4E00, 0x9FFF),
    (0x0600, 0x06FF), (0x0900, 0x097F), (0xAC00, 0xD7AF))

  private def keep(cp: Int): Boolean = {
    if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')) return true
    var i = 0
    while (i < KeepRanges.length) {
      if (cp >= KeepRanges(i)._1 && cp <= KeepRanges(i)._2) return true
      i += 1
    }
    false
  }

  def canon(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSep = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val l = Character.toLowerCase(cp)
      if (keep(l)) {
        // interior runs of dropped chars collapse to ONE space; leading
        // runs emit nothing (the trim half of the contract)
        if (pendingSep && sb.length > 0) sb.append(' ')
        pendingSep = false
        sb.appendCodePoint(l)
      } else pendingSep = true
      i += Character.charCount(cp)
    }
    // a trailing run was never appended: trailing trim is free
    sb.toString
  }

  def column(text: Column): Column =
    ColumnBridge.column(CanonUni(ColumnBridge.expression(text)))
}
