package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.operators.BpeTrainer.Merge

/** The production-k BPE trainer against (1) a full-recount reference
  * (the incremental pair-count maintenance must be invisible), (2) the
  * oracle-checked x99 Spark trainer itself, including a tie that
  * discriminates UTF-8 from UTF-16 ordering, and (3) the encode kernel —
  * the full train→encode lifecycle at a k only the heap encoder can
  * serve. */
class BpeTrainerSpec extends AnyFunSuite with Matchers with SparkTestBase {

  /** Full-recount reference: per round, recount every adjacent pair of
    * every word from scratch (overlap-inclusive, weighted), take the
    * (cnt DESC, lhs, rhs)-min pair in UTF-8 binary order, greedy-merge
    * it into every word. O(k·vocab) — the semantics, minus the speed. */
  private def refTrain(words: Seq[(String, Long)], k: Int): Seq[Merge] = {
    import org.apache.spark.unsafe.types.UTF8String
    def u8 = (a: String, b: String) =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
    var vocab: Seq[(Vector[String], Long)] = words.map { case (w, n) =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cw = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + cw); i += cw
      }
      (b.result(), n)
    }
    val out = Seq.newBuilder[Merge]
    var made = 0
    var done = false
    while (made < k && !done) {
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (ss, n) =>
        ss.zip(ss.tail).foreach { p => cnt.update(p, cnt.getOrElse(p, 0L) + n) }
      }
      if (cnt.isEmpty) done = true
      else {
        val ((l, r), c) = cnt.minBy { case ((l, r), c) => (-c, l, r) }(
          Ordering.Tuple3(Ordering.Long, Ordering.comparatorToOrdering(
            (a: String, b: String) => u8(a, b)), Ordering.comparatorToOrdering(
            (a: String, b: String) => u8(a, b))))
        out += Merge(l, r, c)
        made += 1
        vocab = vocab.map { case (ss, n) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
              b += l + r; i += 2
            } else { b += ss(i); i += 1 }
          }
          (b.result(), n)
        }
      }
    }
    out.result()
  }

  test("incremental trainer ≡ full-recount reference on random weighted vocabularies") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 20).foreach { trial =>
      val alphabet = "aabbc"
      val words = (1 to rnd.nextInt(40) + 5).map { _ =>
        (Seq.fill(rnd.nextInt(10) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          rnd.nextInt(9) + 1L)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val k = rnd.nextInt(40) + 1
      withClue(s"trial $trial words=$words k=$k: ") {
        BpeTrainer.train(words, k) shouldBe refTrain(words, k)
      }
    }
  }

  test("adjacent-double corpora (the x99 greedy-scan pin)") {
    // 'aaaa': overlap-inclusive counting gives (a,a)=3 per occurrence; the
    // greedy i+=2 merge leaves [aa, aa]; next round learns (aa, aa)
    val got = BpeTrainer.train(Seq(("aaaa", 2L)), 3)
    got shouldBe refTrain(Seq(("aaaa", 2L)), 3)
    got.head shouldBe Merge("a", "a", 6L) // 3 adjacent positions × weight 2
    got(1) shouldBe Merge("aa", "aa", 2L)
    // 'abab': (a,b) twice per word beats (b,a) once
    val got2 = BpeTrainer.train(Seq(("abab", 1L)), 2)
    got2 shouldBe refTrain(Seq(("abab", 1L)), 2)
    got2.head shouldBe Merge("a", "b", 2L)
  }

  test("trainer(k=3) ≡ the oracle-checked x99 Spark trainer on the shipped corpus") {
    val sf = "/root/testdata/sf0.001"
    // registry: x99_bpe_merges
    val x99 = graft.queries.TextQueries.bpeMerges.run(spark, sf).collect()
      .map(r => Merge(r.getString(1), r.getString(2), r.getLong(3))).toSeq
    BpeTrainer.trainOn(spark, sf, 3) shouldBe x99
  }

  test("tie-break is UTF-8 binary order like Spark's ORDER BY, not UTF-16") {
    import spark.implicits._
    // U+FFFD is 3 UTF-8 bytes (EF BF BD); U+1D11E is 4 (F0 9D 84 9E) but a
    // surrogate PAIR in UTF-16 starting D834 < FFFD: the two orders
    // disagree on which pair is smaller. Equal counts force the tie.
    val bmp = "�"
    val supp = new String(Character.toChars(0x1D11E))
    val words = Seq((s"x$bmp", 5L), (s"x$supp", 5L))
    val mine = BpeTrainer.train(words, 1)
    mine.head shouldBe Merge("x", bmp, 5L) // UTF-8: EF... < F0...
    // and the x99 Spark argmax agrees, run on a synthetic documents dir
    val dir = java.nio.file.Files.createTempDirectory("bpe-tie").toString
    Seq((1L, "synth", "xx", s"x$bmp", 2), (2L, "synth", "xx", s"x$supp", 2),
      (3L, "synth", "xx", s"x$bmp x$supp x$bmp x$supp x$bmp x$supp x$bmp x$supp", 23))
      .toDF("doc_id", "source", "lang", "text", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val sparkFirst = graft.queries.TextQueries.bpeMerges.run(spark, dir)
      .collect().head
    (sparkFirst.getString(1), sparkFirst.getString(2)) shouldBe ("x", bmp)
  }

  test("full lifecycle at production-shaped k: train 300 merges, encode with the heap kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val alphabet = "aabbccd"
    val corpus = (1 to 400).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(8) + 2)(
        Seq.fill(rnd.nextInt(12) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString)
        .mkString(" "))
    }
    val wc = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }.toSeq
    val merges = BpeTrainer.train(wc, 300)
    merges.length should be <= 300
    merges.length should be > 50 // the corpus supports deep vocabularies
    merges shouldBe refTrain(wc, 300)
    // encode the training corpus with the trained table through the
    // registered expression (k >= 16 dispatches to the heap path) and
    // check the reference fold agrees on every doc
    val fl = BpeTrainer.mergesString(merges)
    val got = corpus.toDF("doc_id", "text")
      .selectExpr("doc_id", s"graft_bpe_tokens(text, '$fl') AS toks")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val pairList = merges.map(m => (m.lhs, m.rhs))
    corpus.foreach { case (id, text) =>
      val want = text.split(" ").toVector.flatMap { w =>
        pairList.foldLeft(w.map(_.toString).toVector) { case (ss, (l, r)) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) { b += l + r; i += 2 }
            else { b += ss(i); i += 1 }
          }
          b.result()
        }
      }
      withClue(s"doc $id: ") { got(id) shouldBe want }
    }
  }
}
