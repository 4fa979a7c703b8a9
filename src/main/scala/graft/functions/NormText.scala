package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native normalization kernel behind x142 (`graft_norm_text(text)`).
  *
  * Semantics are EXACTLY the HOF formulation it replaces —
  *
  *   array_join(filter(split(trim(lower(text)), "\\s+"),
  *              (t, i) => i = 0 OR t != ts[i - 1]), " ")
  *
  * — lowercase, trim SPACES (Spark's `trim` touches 0x20 only, not \s),
  * split on Java-regex `\s+` with Spark `split`'s limit = -1 (a leading
  * non-space whitespace char yields an EMPTY first token; trailing
  * whitespace yields an empty last token — both preserved), drop each
  * token equal to its immediate predecessor IN THE ORIGINAL ARRAY (crawl
  * stutter collapse), join survivors with one space.
  *
  * Why not the HOF: Spark's higher-order array functions evaluate their
  * lambdas interpreted (CodegenFallback) — x142 was the registry's one
  * interpreted hot path (~6 s at sf0.1, r17 verdict item 3). This kernel
  * does the identical arithmetic in ONE JVM pass per row over the
  * lowered string: no token array, no per-element lambda frames, no
  * intermediate strings beyond the output builder. Codegen embeds it as
  * a single static call (the [[BpeEncode]] precedent).
  *
  * Parity notes:
  *  - lower/trim go through `UTF8String.toLowerCase`/`trim` — the same
  *    methods Spark's `Lower`/`StringTrim` call under the default
  *    UTF8_BINARY collation, so those two steps are byte-identical by
  *    construction.
  *  - `\s` here is Java's [ \t\n\x0B\f\r] (what Spark `split` matches),
  *    NOT RE2's \s — same caveat as [[BpeEncode.isWs]]; the shipped
  *    corpora are asserted \x0B-free (OracleAssumptionsSpec).
  *  - token equality is span equality on the lowered string — byte
  *    equality, same as the HOF's UTF8String `=!=`.
  * NormTextSpec pins kernel ≡ HOF on the adversarial cases (empty, all
  * whitespace, leading/trailing tabs, multi-space runs, unicode, stutter
  * runs at both ends) plus a scalacheck sweep, and x142's oracle hash is
  * unchanged at both sfs.
  */
object NormText {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def norm(srcU: UTF8String): UTF8String = {
    // lower → trim, the exact operators (and order) of the HOF chain
    val s = srcU.toLowerCase.trim().toString
    val n = s.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    val out = new java.lang.StringBuilder(n)
    var prevSt = -1
    var prevEn = -1 // previous ORIGINAL token (kept or not)
    var anyKept = false
    var firstTok = true
    var tokStart = 0
    var done = false
    while (!done) {
      // current token = [tokStart, j) up to the next \s run (or end)
      var j = tokStart
      while (j < n && !isWs(s.charAt(j))) j += 1
      // keep iff index 0, or differs from the previous original token
      val sameAsPrev = !firstTok && (prevEn - prevSt == j - tokStart) &&
        s.regionMatches(prevSt, s, tokStart, j - tokStart)
      if (firstTok || !sameAsPrev) {
        if (anyKept) out.append(' ')
        out.append(s, tokStart, j)
        anyKept = true
      }
      prevSt = tokStart; prevEn = j; firstTok = false
      if (j == n) done = true
      else {
        var k = j + 1
        while (k < n && isWs(s.charAt(k))) k += 1
        tokStart = k
        // trailing \s run: split(limit = -1) keeps the trailing EMPTY
        // token — the loop naturally emits [n, n) on its next turn
      }
    }
    UTF8String.fromString(out.toString)
  }
}

/** `graft_norm_text(text)` → STRING: x142's normalization (lowercase,
  * space-trim, \s+-split, consecutive-stutter collapse, single-space
  * join) as one codegen'd pass — see [[graft.functions.NormText]]. */
case class NormTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_norm_text needs STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullSafeEval(text: Any): Any =
    NormText.norm(text.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.NormText.norm($t)")
  override protected def withNewChildInternal(newChild: Expression): NormTextExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_norm_text"
}
