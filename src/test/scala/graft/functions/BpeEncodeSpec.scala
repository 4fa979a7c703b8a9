package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The native BPE-encode kernel (`graft_bpe_tokens`, x103's hot path) against
  * an imperative reference: whitespace split + char symbols + greedy
  * left-to-right i+=2 merge passes in order — the same reference the x99
  * trainer is pinned to. */
class BpeEncodeSpec extends AnyFunSuite with Matchers with SparkTestBase {

  /** Imperative ground truth (mirrors TextQueriesEdgeSpec's trainer). */
  private def refTokens(text: String, merges: Seq[(String, String)]): Vector[String] =
    text.trim.split("\\s+").filter(_.nonEmpty).toVector.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toVector) { case (ss, (l, r)) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) { b += l + r; i += 2 }
          else { b += ss(i); i += 1 }
        }
        b.result()
      }
    }

  private def kernel(text: String, merges: Seq[(String, String)]): Vector[String] = {
    import org.apache.spark.unsafe.types.UTF8String
    val flat = merges.flatMap(p => Seq(p._1, p._2)).mkString(" ")
    BpeEncode.tokens(UTF8String.fromString(text), UTF8String.fromString(flat))
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toVector
  }

  private val merges3 = Seq(("a", "a"), ("a", "b"), ("aa", "aa"))

  test("kernel ≡ imperative reference on adversarial inputs") {
    val cases = Seq(
      "aaaa abab",                 // back-to-back pair occurrences, both kinds
      "aaaaa",                     // odd run: trailing singleton
      "erer erere",                // boundary-sharing chain on lhs≠rhs
      "hello world",               // untouched words
      "  leading  and\ttrailing \n ws  ", // \s+ split incl. tabs/newlines
      "a",                         // single char
      "aaaaaaaa",                  // two rounds of (a,a) then (aa,aa)
      "ab",                        // exactly one pair
      "xyażé λμ",                  // non-ASCII chars stay single symbols
      "")                          // empty text -> zero tokens
    cases.foreach { t =>
      withClue(s"text='$t': ") { kernel(t, merges3) shouldBe refTokens(t, merges3) }
    }
    // zero merges: pure char explode
    kernel("ab cd", Nil) shouldBe Vector("a", "b", "c", "d")
    // merge order matters on 'aab': (a,b) first leaves [a, ab]; (a,a)
    // first consumes the leading pair and leaves [aa, b]
    kernel("aab", Seq(("a", "b"), ("a", "a"))) shouldBe Vector("a", "ab")
    kernel("aab", Seq(("a", "a"), ("a", "b"))) shouldBe Vector("aa", "b")
    kernel("aab", Seq(("a", "b"))) shouldBe Vector("a", "ab")
  }

  test("kernel ≡ imperative reference on random words (property sweep)") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "aabbc" // skewed so merges actually fire
    (1 to 300).foreach { _ =>
      val nWords = rnd.nextInt(5) + 1
      val text = Seq.fill(nWords)(
        Seq.fill(rnd.nextInt(10) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString
      ).mkString(" ")
      val merges = Seq(("a", "a"), ("b", "b"), ("aa", "b"))
      withClue(s"text='$text': ") { kernel(text, merges) shouldBe refTokens(text, merges) }
    }
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
}
