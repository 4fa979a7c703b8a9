package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The native BPE-encode kernel (`graft_bpe_tokens`, x103's hot path) against
  * an imperative reference: whitespace split + code-point symbols + greedy
  * left-to-right i+=2 merge passes in order — the same reference the x99
  * trainer is pinned to. Every parity case runs through BOTH encode paths
  * (the per-pass scan and the production heap-of-pairs form) so the size
  * dispatch can never change results. */
class BpeEncodeSpec extends AnyFunSuite with Matchers with SparkTestBase {

  /** Imperative ground truth (mirrors TextQueriesEdgeSpec's trainer).
    * Symbols are CODE POINTS, matching the trainer's `regexp_replace(w,
    * '(.)', '$1 ')` and the DuckDB oracle's `(.)` — both code-point regexes. */
  private def refTokens(text: String, merges: Seq[(String, String)]): Vector[String] =
    text.trim.split("\\s+").filter(_.nonEmpty).toVector.flatMap { w =>
      val syms = {
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < w.length) {
          val cw = Character.charCount(w.codePointAt(i))
          b += w.substring(i, i + cw); i += cw
        }
        b.result()
      }
      merges.foldLeft(syms) { case (ss, (l, r)) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) { b += l + r; i += 2 }
          else { b += ss(i); i += 1 }
        }
        b.result()
      }
    }

  private def flat(merges: Seq[(String, String)]): String =
    merges.flatMap(p => Seq(p._1, p._2)).mkString(" ")

  /** Kernel through the public dispatch. */
  private def kernel(text: String, merges: Seq[(String, String)]): Vector[String] = {
    import org.apache.spark.unsafe.types.UTF8String
    BpeEncode.tokens(UTF8String.fromString(text), UTF8String.fromString(flat(merges)))
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toVector
  }

  /** Kernel pinned to one path. */
  private def kernelPath(text: String, merges: Seq[(String, String)],
      heap: Boolean): Vector[String] =
    BpeEncode.tokensPath(text, flat(merges), heap)
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toVector

  private def checkBoth(text: String, merges: Seq[(String, String)]): Unit = {
    val want = refTokens(text, merges)
    withClue(s"text='$text' scan path: ") {
      kernelPath(text, merges, heap = false) shouldBe want
    }
    withClue(s"text='$text' heap path: ") {
      kernelPath(text, merges, heap = true) shouldBe want
    }
  }

  private val merges3 = Seq(("a", "a"), ("a", "b"), ("aa", "aa"))

  test("kernel ≡ imperative reference on adversarial inputs (both paths)") {
    val cases = Seq(
      "aaaa abab",                 // back-to-back pair occurrences, both kinds
      "aaaaa",                     // odd run: trailing singleton
      "erer erere",                // boundary-sharing chain on lhs≠rhs
      "hello world",               // untouched words
      "  leading  and\ttrailing \n ws  ", // \s+ split incl. tabs/newlines
      "a",                         // single char
      "aaaaaaaa",                  // two rounds of (a,a) then (aa,aa)
      "ab",                        // exactly one pair
      "xyażé λμ",                  // non-ASCII BMP chars stay single symbols
      "")                          // empty text -> zero tokens
    cases.foreach(checkBoth(_, merges3))
    // zero merges: pure char explode
    kernel("ab cd", Nil) shouldBe Vector("a", "b", "c", "d")
    // merge order matters on 'aab': (a,b) first leaves [a, ab]; (a,a)
    // first consumes the leading pair and leaves [aa, b]
    checkBoth("aab", Seq(("a", "b"), ("a", "a")))
    kernel("aab", Seq(("a", "b"), ("a", "a"))) shouldBe Vector("a", "ab")
    kernel("aab", Seq(("a", "a"), ("a", "b"))) shouldBe Vector("aa", "b")
    kernel("aab", Seq(("a", "b"))) shouldBe Vector("a", "ab")
  }

  test("supplementary-plane characters are single symbols (code points, not UTF-16 units)") {
    // 𝄞 (U+1D11E) and 😀 (U+1F600) are surrogate PAIRS in the JVM string;
    // the kernel must treat each as ONE symbol like the oracle's '(.)'
    val g = "𝄞" // 𝄞
    val e = "😀" // 😀
    checkBoth(s"a${g}b $e$e", Seq((g, "b"), (e, e)))
    kernel(s"a${g}b", Nil) shouldBe Vector("a", g, "b")
    kernel(s"$e$e", Seq((e, e))) shouldBe Vector(e + e)
    // a merge ending at a supplementary char keeps the full pair intact
    kernel(s"a$g", Seq(("a", g))) shouldBe Vector("a" + g)
  }

  test("kernel ≡ imperative reference on random words (property sweep, both paths)") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "aabbc" // skewed so merges actually fire
    (1 to 300).foreach { _ =>
      val nWords = rnd.nextInt(5) + 1
      val text = Seq.fill(nWords)(
        Seq.fill(rnd.nextInt(10) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString
      ).mkString(" ")
      val merges = Seq(("a", "a"), ("b", "b"), ("aa", "b"))
      checkBoth(text, merges)
    }
  }

  /** A k-merge table in valid BPE shape: each merge pairs two symbols
    * drawn from the pool built so far (chars first, merged symbols after),
    * so later merges consume earlier products — the structure a real
    * trained vocab has, at sizes where only the heap path is viable. */
  private def syntheticMerges(k: Int, seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    val pool = scala.collection.mutable.ArrayBuffer[String]("a", "b", "c", "d")
    val seen = scala.collection.mutable.HashSet.empty[(String, String)]
    val out = Seq.newBuilder[(String, String)]
    var made = 0
    while (made < k) {
      val l = pool(rnd.nextInt(pool.length))
      val r = pool(rnd.nextInt(pool.length))
      if (l.length + r.length <= 12 && seen.add((l, r))) {
        out += ((l, r)); pool += l + r; made += 1
      }
    }
    out.result()
  }

  test("heap ≡ scan ≡ reference at production-shaped k (300 merges)") {
    val merges = syntheticMerges(300, seed = 99L)
    merges.length shouldBe 300
    val rnd = new scala.util.Random(42L)
    val alphabet = "aabbccd" // heavy repeats so deep merge chains fire
    (1 to 60).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(4) + 1)(
        Seq.fill(rnd.nextInt(24) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString
      ).mkString(" ")
      val want = refTokens(text, merges)
      withClue(s"text='$text' heap: ") { kernelPath(text, merges, heap = true) shouldBe want }
      withClue(s"text='$text' scan: ") { kernelPath(text, merges, heap = false) shouldBe want }
      // the public dispatch picks the heap at k=300 — same answer
      withClue(s"text='$text' dispatch: ") { kernel(text, merges) shouldBe want }
    }
  }

  test("duplicate-pair merge table falls back to the exact scan path") {
    // ('ab','c') listed at ranks 0 AND 2, with ('a','b') between: on 'abc'
    // pass 0 finds no 'ab' symbol, pass 1 makes one, pass 2 merges to
    // 'abc'. A single-rank map keeps rank 0 and the heap's rank>p guard
    // would stop at [ab, c] — so duplicate tables must take the scan path
    // even when the caller forces heap.
    val dup = Seq(("ab", "c"), ("a", "b"), ("ab", "c"))
    val want = refTokens("abc ababc", dup)
    want shouldBe Vector("abc", "ab", "abc")
    kernelPath("abc ababc", dup, heap = true) shouldBe want
    kernelPath("abc ababc", dup, heap = false) shouldBe want
    // and a padded k>=16 duplicate table still dispatches safely
    val padded = dup ++ syntheticMerges(20, seed = 7L).filterNot(dup.contains)
    kernel("abc ababc", padded) shouldBe refTokens("abc ababc", padded)
  }

  test("tokens partition each word's characters (the x105 n_chars identity)") {
    // x105 computes n_chars as length(text minus \s) and claims it equals
    // Σ|token|; that identity is a property of the kernel (spans partition
    // every word), so pin it directly
    val rnd = new scala.util.Random(7L)
    (1 to 100).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(6) + 1)(
        Seq.fill(rnd.nextInt(12) + 1)("aab" (rnd.nextInt(3))).mkString).mkString("  ")
      val toks = kernel(text, merges3)
      toks.map(_.length).sum shouldBe text.replaceAll("\\s", "").length
    }
  }

  test("interpreted eval and codegen agree; null propagates") {
    import spark.implicits._
    val rows = Seq(("aaaa abab", "a a a b"), ("hello", ""), ("erer", "e r er er"))
    val df = rows.toDF("text", "merges")
      .selectExpr("graft_bpe_tokens(text, merges) AS toks")
    val withCodegen = df.collect().map(_.getSeq[String](0).toList)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = rows.toDF("text", "merges")
        .selectExpr("graft_bpe_tokens(text, merges) AS toks")
        .collect().map(_.getSeq[String](0).toList)
      interpreted.toSeq shouldBe withCodegen.toSeq
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val nul = Seq((Option.empty[String], Option("a b")), (Option("ab"), Option.empty[String]))
      .toDF("text", "merges").selectExpr("graft_bpe_tokens(text, merges) AS toks").collect()
    nul.foreach(_.isNullAt(0) shouldBe true)
  }

  test("per-row merge-table cache revalidates when the merges value changes") {
    import spark.implicits._
    // alternating merge tables within one partition: a stale cache entry
    // would encode row 2 with row 1's table
    val rows = Seq(("aaaa", "a a"), ("aaaa", "a a aa aa"), ("aaaa", "a a"))
    val got = rows.toDF("text", "merges").repartition(1)
      .selectExpr("graft_bpe_tokens(text, merges) AS toks")
      .collect().map(_.getSeq[String](0).toList)
    got.toSeq shouldBe Seq(List("aa", "aa"), List("aaaa"), List("aa", "aa"))
  }
}
