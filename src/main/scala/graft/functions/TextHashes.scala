package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop sketch kernels for the near-dup operators, exposed as native
  * Catalyst expressions with codegen (SURVEY.md §7.1: custom code only where
  * built-ins can't express it efficiently).
  *
  * Why not `transform`/`aggregate` higher-order functions: HOFs are
  * interpreted per-lambda-step, and a k-hash MinHash over an m-shingle doc
  * walks k·m lambda frames per row. These kernels do the same arithmetic in
  * one JVM loop — measured ~10× on the sf0.1 documents table — and codegen
  * embeds them as a single static call inside whole-stage codegen.
  */
object TextHashes {

  /** splitmix64 finalizer — a well-known public-domain 64-bit mixer.
    * Package-visible so HashOracles derives its seed literals from the SAME
    * arithmetic the engine runs (no constant drift between engine and oracle). */
  @inline private[graft] def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }

  private def tokenHash(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    mix64(h)
  }

  /** Hash of the n-token window starting at each token position (element k =
    * window k, trailing sub-n windows kept), NOT sorted or deduplicated —
    * the shared core of `shingleData` (which sorts + dedups it) and
    * `shinglePosData` (which exposes it positionally). */
  private def windowHashes(s: String, n: Int): Array[Long] = {
    // token boundaries (single-space tokenizer, matching split(text, ' '))
    var tokStarts = new Array[Int](16)
    var tokEnds = new Array[Int](16)
    var nTok = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (nTok == tokStarts.length) {
        tokStarts = java.util.Arrays.copyOf(tokStarts, nTok * 2)
        tokEnds = java.util.Arrays.copyOf(tokEnds, nTok * 2)
      }
      tokStarts(nTok) = start; tokEnds(nTok) = i; nTok += 1
      i += 1
    }
    val th = new Array[Long](nTok)
    var t = 0
    while (t < nTok) { th(t) = tokenHash(s, tokStarts(t), tokEnds(t)); t += 1 }

    val m = math.max(nTok - n + 1, 1)
    val out = new Array[Long](m)
    var k = 0
    while (k < m) {
      var h = th(k)
      var j = 1
      while (j < n && k + j < nTok) { h = mix64(h ^ (th(k + j) + 0x9e3779b97f4a7c15L * j)); j += 1 }
      out(k) = h
      k += 1
    }
    out
  }

  /** Distinct hashes of all whitespace-token n-grams of `text` (the trailing
    * sub-n shingle kept for docs shorter than n tokens), sorted ascending. */
  def shingleData(text: UTF8String, n: Int): ArrayData = {
    val out = windowHashes(text.toString, n)
    val m = out.length
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < m) { if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }; r += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** POSITION-ordered window hashes: identical arithmetic to `shingleData`
    * (same `windowHashes` core) but element k is the hash of the window
    * starting at token k (0-based), NOT sorted and NOT deduplicated — so
    * `posexplode` recovers (position, hash) pairs for span-level transforms
    * (x61's substring cut). Invariant (spec-pinned):
    * sortedDistinct(shinglePosData) == shingleData. */
  def shinglePosData(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(windowHashes(text.toString, n))

  /** k-permutation MinHash signature over a hash set (one loop, k mins). */
  def minhashData(hashes: ArrayData, k: Int): ArrayData = {
    val arr = hashes.toLongArray()
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val seed = mix64(j + 0x5851f42d4c957f2dL)
      var best = Long.MaxValue
      var i = 0
      while (i < arr.length) {
        val v = mix64(arr(i) ^ seed)
        if (v < best) best = v
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunk fingerprints (Rabin-style rolling hash): a
    * 16-char polynomial rolling hash walks the text; positions where
    * `h & mask == 0` (and the chunk has ≥ minLen chars) cut a chunk
    * boundary, and each chunk's content FNV is emitted (sorted distinct).
    *
    * Because boundaries depend only on LOCAL content, an edit re-chunks
    * only its neighborhood — unlike fixed-width shingles/blocks, the chunks
    * before and after an insertion keep their hashes (shift-resistant
    * dedup, the CDC property backup/dedup systems rely on). `maskBits`
    * sets the expected chunk length (~2^maskBits chars). */
  def chunkData(text: UTF8String, maskBits: Int, minLen: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    val mask = (1L << maskBits) - 1
    val W = 16
    val B = 257L
    // B^(W-1) for the rolling removal
    var bw = 1L
    var p = 0
    while (p < W - 1) { bw *= B; p += 1 }
    val out = new Array[Long](n / math.max(minLen, 1) + 1)
    var nOut = 0
    var h = 0L
    var chunkStart = 0
    var i = 0
    while (i < n) {
      h = h * B + s.charAt(i)
      if (i - chunkStart >= W) h -= bw * B * s.charAt(i - W)
      val atEnd = i == n - 1
      if (atEnd || (i - chunkStart + 1 >= minLen && (mix64(h) & mask) == 0L)) {
        out(nOut) = tokenHash(s, chunkStart, i + 1)
        nOut += 1
        chunkStart = i + 1
        h = 0L
      }
      i += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, nOut)
    java.util.Arrays.sort(trimmed)
    var w = 0
    var r = 0
    while (r < nOut) { if (r == 0 || trimmed(r) != trimmed(r - 1)) { trimmed(w) = trimmed(r); w += 1 }; r += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(trimmed, w))
  }

  /** One-pass token statistics for the repetition-quality signals:
    * (n_tokens, n_distinct, top_count, n_shingles, sh_distinct) where
    * shingles are the 3-token windows as STRINGS (exact distinct — string
    * equality, not hash equality, so the counts match a portable SQL
    * formulation integer-for-integer). Single-space tokenizer, identical
    * to `split(text, ' ')` including empty tokens. */
  def tokenStatsData(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i <= len) {
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      toks.add(s.substring(start, i))
      i += 1
    }
    val n = toks.size()
    val counts = new java.util.HashMap[String, Int]()
    var top = 0
    var t = 0
    while (t < n) {
      val c = counts.merge(toks.get(t), 1, Integer.sum)
      if (c > top) top = c
      t += 1
    }
    val nSh = math.max(n - 2, 0)
    val shSet = new java.util.HashSet[String]()
    var k = 0
    while (k < nSh) {
      shSet.add(toks.get(k) + " " + toks.get(k + 1) + " " + toks.get(k + 2))
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size(), top, nSh, shSet.size()))
  }

  /** 64-bit SimHash from a token-hash array (branch-free vote loop). */
  def simhashData(hashes: ArrayData): Long = {
    val arr = hashes.toLongArray()
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.length) {
      val h = arr(i)
      var b = 0
      while (b < 64) { votes(b) += (((h >>> b) & 1L).toInt << 1) - 1; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}

/** `graft_shingles(text, n)` → sorted distinct ARRAY<BIGINT> shingle hashes. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_shingles needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.shingleData(input.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.shingleData($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_shingles"
}

/** `graft_shingle_pos(text, n)` → ARRAY<BIGINT> window hashes in POSITION
  * order (element k = window starting at token k; not sorted, not deduped). */
case class ShinglePosHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_shingle_pos needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.shinglePosData(input.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.shinglePosData($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglePosHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_pos"
}

/** `graft_chunks(text, maskBits, minLen)` → sorted distinct ARRAY<BIGINT>
  * content-defined chunk fingerprints (shift-resistant CDC dedup keys). */
case class ChunkHashes(child: Expression, maskBits: Int, minLen: Int) extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 30, "maskBits must be in [1, 30]")
  require(minLen >= 1, "minLen must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_chunks needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.chunkData(input.asInstanceOf[UTF8String], maskBits, minLen)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.chunkData($c, $maskBits, $minLen)")
  override protected def withNewChildInternal(newChild: Expression): ChunkHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_chunks"
}

/** `graft_token_stats(text)` → STRUCT(n_tokens, n_distinct, top_count,
  * n_shingles, sh_distinct) — one tight loop instead of the O(distinct·n)
  * interpreted HOF scan the ratios would otherwise need. */
case class TokenStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_token_stats needs STRING, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false),
    StructField("n_shingles", IntegerType, nullable = false),
    StructField("sh_distinct", IntegerType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextHashes.tokenStatsData(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.tokenStatsData($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
  override def prettyName: String = "graft_token_stats"
}

/** `graft_minhash(hashes, k)` → ARRAY<BIGINT> MinHash signature. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "signature length must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_minhash needs ARRAY<BIGINT>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.minhashData(input.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.minhashData($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

/** `graft_simhash(hashes)` → BIGINT 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_simhash needs ARRAY<BIGINT>, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.simhashData(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhashData($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}
