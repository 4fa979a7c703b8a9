package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Unit tests for the native sketch expressions registered by
  * GraftExtensions. */
// registry: x25_text_repetition (the repetition profile query rides
// graft_token_stats; value gate = DuckDB oracle + the hand-computed facts below)
class TextHashesSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def one(sqlExpr: String, text: String) = {
    import spark.implicits._
    Seq(text).toDF("text").selectExpr(sqlExpr).collect()(0)
  }

  test("graft_shingles: distinct sorted n-gram hashes, short-doc fallback") {
    val r = one("graft_shingles(text, 3)", "a b c d")
    val arr = r.getSeq[Long](0)
    arr.length shouldBe 2                       // "a b c", "b c d"
    arr shouldBe arr.sorted
    // repeated shingles dedup: "a b a b a b" has shingles {aba, bab}
    one("graft_shingles(text, 3)", "a b a b a b").getSeq[Long](0).length shouldBe 2
    // fewer tokens than n → one shingle of the whole doc
    one("graft_shingles(text, 3)", "xy").getSeq[Long](0).length shouldBe 1
    // 1-gram = distinct token hashes
    one("graft_shingles(text, 1)", "a b a").getSeq[Long](0).length shouldBe 2
  }

  test("graft_shingles is order-sensitive (n>1) and deterministic") {
    val ab = one("graft_shingles(text, 2)", "a b").getSeq[Long](0)
    val ba = one("graft_shingles(text, 2)", "b a").getSeq[Long](0)
    ab should not be ba
    ab shouldBe one("graft_shingles(text, 2)", "a b").getSeq[Long](0)
  }

  test("graft_minhash: k mins, equal sets → equal signatures, similar sets agree") {
    val sig = one("graft_minhash(graft_shingles(text, 3), 32)", "the quick brown fox jumps")
      .getSeq[Long](0)
    sig.length shouldBe 32
    val sig2 = one("graft_minhash(graft_shingles(text, 3), 32)", "the quick brown fox jumps")
      .getSeq[Long](0)
    sig shouldBe sig2
    // a doc sharing most shingles agrees on most signature slots
    val near = one("graft_minhash(graft_shingles(text, 3), 32)",
      "the quick brown fox jumps high").getSeq[Long](0)
    sig.zip(near).count { case (a, b) => a == b } should be >= 16
  }

  test("graft_simhash: near-identical docs land within small Hamming distance") {
    def sim(t: String) =
      one("graft_simhash(graft_shingles(text, 1))", t).getLong(0)
    val a = sim("alpha beta gamma delta epsilon zeta eta theta")
    val b = sim("alpha beta gamma delta epsilon zeta eta iota")
    val far = sim("one two three four five six seven eight")
    java.lang.Long.bitCount(a ^ b) should be <= 16
    java.lang.Long.bitCount(a ^ far) should be > 16
  }

  test("graft_token_stats: counts match hand-computed repetition facts") {
    val r = one("graft_token_stats(text)", "a b a b c a b c")
    val st = r.getStruct(0)
    // 8 tokens, 3 distinct, 'a'/'b' appear 3x, 6 shingles of which
    // "a b a","b a b","a b c","b c a","c a b","a b c" → 5 distinct
    st.getInt(0) shouldBe 8
    st.getInt(1) shouldBe 3
    st.getInt(2) shouldBe 3
    st.getInt(3) shouldBe 6
    st.getInt(4) shouldBe 5
    // sub-shingle-width doc
    val short = one("graft_token_stats(text)", "x y").getStruct(0)
    short.getInt(0) shouldBe 2
    short.getInt(3) shouldBe 0
    short.getInt(4) shouldBe 0
  }

  test("graft_chunks: content-defined boundaries survive an insertion (CDC)") {
    // deterministic pseudo-text, long enough for ~20 chunks at maskBits 5
    val rnd = new scala.util.Random(41L)
    def word() = (0 until (3 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val original = (0 until 250).map(_ => word()).mkString(" ")
    val half = original.length / 2
    val edited = original.substring(0, half) + " inserted span of new text " +
      original.substring(half)
    def chunks(t: String) = one("graft_chunks(text, 5, 16)", t).getSeq[Long](0).toSet
    val a = chunks(original)
    val b = chunks(edited)
    a.size should be >= 10 // the mask actually cuts chunks
    a shouldBe chunks(original) // deterministic
    // the edit re-chunks only its neighborhood: most fingerprints survive
    val shared = (a & b).size.toDouble / a.size
    info(f"CDC chunk survival after mid-document insertion: $shared%.2f")
    shared should be >= 0.7
  }

  test("interpreted eval and codegen agree") {
    import spark.implicits._
    val df = Seq("a b c d e", "lorem ipsum dolor sit amet", "x").toDF("text")
      .selectExpr("graft_shingles(text, 3) AS sh")
      .selectExpr("graft_minhash(sh, 8) AS mh", "graft_simhash(sh) AS sim")
    // force both paths: collect() runs codegen; expression .eval via a
    // literal-driven plan with codegen disabled
    val withCodegen = df.collect().map(r => (r.getSeq[Long](0).toList, r.getLong(1)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = Seq("a b c d e", "lorem ipsum dolor sit amet", "x").toDF("text")
        .selectExpr("graft_shingles(text, 3) AS sh")
        .selectExpr("graft_minhash(sh, 8) AS mh", "graft_simhash(sh) AS sim")
        .collect().map(r => (r.getSeq[Long](0).toList, r.getLong(1)))
      interpreted.toSeq shouldBe withCodegen.toSeq
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null text yields null sketches") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("text")
      .selectExpr("graft_shingles(text, 3) AS sh").collect()(0)
    r.isNullAt(0) shouldBe true
  }

  test("graft_shingle_pos: position order, and sorted-distinct ≡ graft_shingles") {
    import spark.implicits._
    val texts = Seq("a b c d e f g h i j", "a b a b a b a b a b", "x", "a b c")
    val rows = texts.toDF("text")
      .selectExpr("graft_shingle_pos(text, 8) AS wp", "graft_shingles(text, 8) AS ws",
        "size(split(text, ' ')) AS n")
      .collect()
    rows.foreach { r =>
      val wp = r.getSeq[Long](0)
      val ws = r.getSeq[Long](1)
      val n = r.getInt(2)
      wp.length shouldBe math.max(n - 7, 1) // one entry per window POSITION
      wp.distinct.sorted shouldBe ws // the pinned invariant
    }
    // repetitive doc: positional form keeps the duplicates shingleData drops
    val rep = rows(1)
    rep.getSeq[Long](0).distinct.length should be < rep.getSeq[Long](0).length
  }
}
