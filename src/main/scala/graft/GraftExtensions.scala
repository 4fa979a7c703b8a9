package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{BpeTokens, ChunkHashes, DotProduct, MinHashSignature, NormTextExpr, ShingleHashes, ShinglePosHashes, SimHash64, TokenStats}

/** SparkSessionExtensions registering the engine's native expressions, so
  * they are callable from SQL and `expr(...)` alike:
  *
  *   spark.sql.extensions=graft.GraftExtensions    (or builder.withExtensions)
  *
  *   graft_shingles(text, n)  → ARRAY<BIGINT> distinct n-gram shingle hashes
  *   graft_shingle_pos(text, n) → ARRAY<BIGINT> window hashes, position order
  *   graft_minhash(hashes, k) → ARRAY<BIGINT> MinHash signature
  *   graft_simhash(hashes)    → BIGINT 64-bit SimHash
  *   graft_chunks(text, b, m) → ARRAY<BIGINT> content-defined chunk hashes
  *   graft_token_stats(text)  → STRUCT token/shingle repetition counts
  *   graft_dot(a, b)          → DOUBLE sequential-fold dot product
  *   graft_bpe_tokens(text, merges) → ARRAY<STRING> BPE tokens (greedy
  *                              in-order merge application; see x103)
  *   graft_norm_text(text)    → STRING x142 normalization (lower, trim,
  *                              \s+-split, stutter collapse, space join)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) => ShingleHashes(text, intLit(n, "shingle width"))
        case _ => throw new IllegalArgumentException("graft_shingles(text, n)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_pos"),
      new ExpressionInfo(classOf[ShinglePosHashes].getName, "graft_shingle_pos"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) => ShinglePosHashes(text, intLit(n, "shingle width"))
        case _ => throw new IllegalArgumentException("graft_shingle_pos(text, n)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => args match {
        case Seq(hashes, k) => MinHashSignature(hashes, intLit(k, "signature length"))
        case _ => throw new IllegalArgumentException("graft_minhash(hashes, k)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => args match {
        case Seq(hashes) => SimHash64(hashes)
        case _ => throw new IllegalArgumentException("graft_simhash(hashes)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_chunks"),
      new ExpressionInfo(classOf[ChunkHashes].getName, "graft_chunks"),
      (args: Seq[Expression]) => args match {
        case Seq(text, mb, ml) =>
          ChunkHashes(text, intLit(mb, "maskBits"), intLit(ml, "minLen"))
        case _ => throw new IllegalArgumentException("graft_chunks(text, maskBits, minLen)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "graft_token_stats"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => TokenStats(text)
        case _ => throw new IllegalArgumentException("graft_token_stats(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("graft_dot(a, b)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokens].getName, "graft_bpe_tokens"),
      (args: Seq[Expression]) => args match {
        case Seq(text, merges) => BpeTokens(text, merges)
        case _ => throw new IllegalArgumentException("graft_bpe_tokens(text, merges)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_norm_text"),
      new ExpressionInfo(classOf[NormTextExpr].getName, "graft_norm_text"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => NormTextExpr(text)
        case _ => throw new IllegalArgumentException("graft_norm_text(text)")
      }))
  }
}
