package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE-encode kernel behind x103 (`graft_bpe_tokens(text, merges)`).
  *
  * Why not the nested-HOF formulation: `aggregate`/`transform` lambdas are
  * interpreted per element, and encoding one document walks
  * words × symbols × merges lambda frames — measured ~15 s for the sf0.1
  * corpus. This kernel does the identical arithmetic in one JVM loop per
  * row (whitespace split, char symbols, k greedy merge passes) on SPAN
  * indices into the original string — a merge of adjacent spans is always
  * contiguous, so no symbol string is ever materialized until the final
  * token substrings. Codegen embeds it as a single static call.
  *
  * `merges` is the learned table flattened to a space-separated pair list
  * ("l1 r1 l2 r2 …", safe because symbols come from whitespace-split words
  * and can never contain whitespace) — k-general, applied IN ORDER, each
  * pass the greedy left-to-right i+=2 scan of Sennrich et al. 2016 (same
  * rule as x99's training fold and the recursive-CTE oracle; the
  * TextQueriesEdgeSpec adjacent-double corpus pins all three). Cost is
  * O(k·len) per doc — fine for the demo k; a production k≈32k encoder
  * switches to the heap-of-pairs form, same semantics.
  */
object BpeEncode {

  /** Java-regex `\s` (what `split(text, '\\s+')` and the DuckDB oracle's
    * `string_split_regex '\s+'` both match). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def spanIs(s: String, from: Int, until: Int, t: String): Boolean =
    until - from == t.length && s.regionMatches(from, t, 0, t.length)

  def tokens(textU: UTF8String, mergesU: UTF8String): ArrayData = {
    val s = textU.toString
    val m = mergesU.toString.trim
    val mp: Array[String] = if (m.isEmpty) Array.empty else m.split(" ")
    if (mp.length % 2 != 0)
      throw new IllegalArgumentException(
        s"graft_bpe_tokens: merges must be a flat pair list, got ${mp.length} symbols")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var st: Array[Int] = new Array[Int](64)
    var en: Array[Int] = new Array[Int](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val w0 = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > w0) {
        // one span per char, then one greedy in-place pass per merge
        var cnt = i - w0
        if (cnt > st.length) {
          st = new Array[Int](cnt); en = new Array[Int](cnt)
        }
        var j = 0
        while (j < cnt) { st(j) = w0 + j; en(j) = w0 + j + 1; j += 1 }
        var p = 0
        while (p < mp.length) {
          val l = mp(p); val r = mp(p + 1)
          var ri = 0; var wi = 0
          while (ri < cnt) {
            if (ri + 1 < cnt && spanIs(s, st(ri), en(ri), l) &&
                spanIs(s, st(ri + 1), en(ri + 1), r)) {
              st(wi) = st(ri); en(wi) = en(ri + 1); ri += 2
            } else {
              st(wi) = st(ri); en(wi) = en(ri); ri += 1
            }
            wi += 1
          }
          cnt = wi
          p += 2
        }
        j = 0
        while (j < cnt) {
          out += UTF8String.fromString(s.substring(st(j), en(j)))
          j += 1
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_bpe_tokens(text, merges)` → ARRAY<STRING> BPE tokens of every
  * whitespace word of `text`, after applying the space-flattened `merges`
  * pair list in order (greedy left-to-right per pair). */
case class BpeTokens(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_tokens needs (STRING, STRING), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any, merges: Any): Any =
    BpeEncode.tokens(text.asInstanceOf[UTF8String], merges.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.functions.BpeEncode.tokens($t, $m)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeTokens =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_bpe_tokens"
}
