package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Round-19 curation audits: x157 (gate-rule agreement / Cohen's κ), x158
  * (decon-adjusted mixture shift), x159 (nearest-centroid label confusion) —
  * driver replays on engineered frames plus the hand-computable edge each
  * query's convention pins (κ on constant verdicts, the fully-purged
  * source, the own-label tie rule). */
class CurationAuditsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def md5hex(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** A doc passing all four gate rules: 40 words, mean_wlen 4.85, no
    * repeated bigram, two stopwords (the DocStreamSpec construction). */
  private def good(p: String): String =
    "the a " + (1 to 38).map(i => f"$p${i}%04d").mkString(" ")

  test("x157 gate agreement ≡ BigInt driver replay on a mixed corpus; schema and pair order pinned") {
    // registry: x157_gate_rule_agreement
    import spark.implicits._
    val dd = (
      (1 to 8).map(i => (i.toLong, good(s"g$i"))) ++            // all-pass
      Seq((20L, "the a zz"),                                     // short: fails len+wlen
        (21L, (1 to 30).map(i => f"v${i}%04d").mkString(" ")),   // no stopwords
        (22L, "the a " + ("bb " * 40).trim))                     // repetition fail
    ).toDF("doc_id", "text")
    val got = TextQueries.gateRuleAgreementOf(dd)
      .orderBy("rule_a", "rule_b").collect()
    got.map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("len", "rep"), ("len", "stop"), ("len", "wlen"),
        ("rep", "stop"), ("wlen", "rep"), ("wlen", "stop")).sorted
    // replay: recompute every cell and the κ convention from the verdict
    // table with BigInt math (toSeq first — the Set-dedup replay trap)
    val v = TextQueries.qualityGateOf(dd)
      .select("r_len", "r_wlen", "r_rep", "r_stop").collect()
      .map(r => Map("len" -> r.getInt(0), "wlen" -> r.getInt(1),
        "rep" -> r.getInt(2), "stop" -> r.getInt(3))).toSeq
    val n = v.size.toLong
    def ppm(x: Long): Long = x * 1000000L / n
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val pa = v.map(_(a).toLong).sum; val pb = v.map(_(b).toLong).sum
      val bp = v.count(m => m(a) == 1 && m(b) == 1).toLong
      val bf = v.count(m => m(a) == 0 && m(b) == 0).toLong
      r.getAs[Long]("n_docs") shouldBe n
      r.getAs[Long]("pass_a") shouldBe pa
      r.getAs[Long]("pass_b") shouldBe pb
      r.getAs[Long]("both_pass") shouldBe bp
      r.getAs[Long]("both_fail") shouldBe bf
      val agree = (bp + bf) * 1000000L / n
      val pe = (ppm(pa) * ppm(pb) + ppm(n - pa) * ppm(n - pb)) / 1000000L
      r.getAs[Long]("agree_ppm") shouldBe agree
      r.getAs[Long]("pe_ppm") shouldBe pe
      val kappa =
        if (pe == 1000000L) 0L
        else if (agree >= pe) (agree - pe) * 1000000L / (1000000L - pe)
        else -((pe - agree) * 1000000L / (1000000L - pe))
      r.getAs[Long]("kappa_ppm") shouldBe kappa
    }
  }

  test("x157 κ conventions: constant verdicts pin κ = 0; perfect disagreement pins κ = −10⁶") {
    import spark.implicits._
    // every doc passes everything → pe = 10⁶ for every pair → κ = 0, not 0/0
    // single-char prefixes: 5-char tokens keep mean_wlen at 4.85 (a longer
    // prefix fails r_wlen and the corpus stops being constant-verdict)
    val allPass = (1 to 6).map(i => (i.toLong, good(('a' + i).toChar.toString)))
      .toDF("doc_id", "text")
    TextQueries.gateRuleAgreementOf(allPass).collect().foreach { r =>
      r.getAs[Long]("agree_ppm") shouldBe 1000000L
      r.getAs[Long]("pe_ppm") shouldBe 1000000L
      r.getAs[Long]("kappa_ppm") shouldBe 0L
    }
    // (len, stop) engineered to perfect disagreement, 50/50: type1 passes
    // len only ("b"×30: 1-char words, all-dup bigrams, no stopwords);
    // type2 passes stop only ("the a": 2 words)
    val disagree = (
      (1 to 3).map(i => (i.toLong, ("b " * 30).trim)) ++
      (4 to 6).map(i => (i.toLong, "the a"))
    ).toDF("doc_id", "text")
    val ls = TextQueries.gateRuleAgreementOf(disagree)
      .filter(org.apache.spark.sql.functions.col("rule_a") === "len" &&
        org.apache.spark.sql.functions.col("rule_b") === "stop")
      .collect().head
    ls.getAs[Long]("agree_ppm") shouldBe 0L
    ls.getAs[Long]("pe_ppm") shouldBe 500000L
    ls.getAs[Long]("kappa_ppm") shouldBe -1000000L // the split-sign floor-div
  }

  test("x158 decon shift: purge mass reconciles with x35 per source; fully-purged source pins w_clean = 0") {
    // registry: x158_decon_mixture_shift
    import spark.implicits._
    val ids = (1L to 2000L)
    val trainIds = ids.filter(md5hex(_).charAt(0) <= 'd')
    val testId = ids.filter(md5hex(_).charAt(0) > 'd').head
    val Seq(a1, a2, b1, c1) = trainIds.take(4).toSeq
    val gram = "g1 g2 g3 g4 g5"
    val dd = Seq(
      (a1, "web", (1 to 35).map(i => s"w$i").mkString(" ")),  // clean, 35 tok
      (a2, "web", s"${(1 to 20).map(i => s"x$i").mkString(" ")} $gram"), // purged, 25 tok
      (b1, "wiki", (1 to 40).map(i => s"k$i").mkString(" ")), // clean, 40 tok
      (c1, "books", s"${(1 to 10).map(i => s"z$i").mkString(" ")} $gram"), // purged, 15 tok — books FULLY purged
      (testId, "eval", gram)
    ).toDF("doc_id", "source", "text")
    val got = TextQueries.deconMixtureShiftOf(dd).orderBy("source").collect()
      .map(r => r.getString(0) -> r).toMap
    // masses and purge counts reconcile with x35's flagged set by hand
    got("web").getAs[Long]("n_docs") shouldBe 2L
    got("web").getAs[Long]("n_purged") shouldBe 1L
    got("web").getAs[Long]("tokens_raw") shouldBe 60L
    got("web").getAs[Long]("tokens_clean") shouldBe 35L
    got("wiki").getAs[Long]("n_purged") shouldBe 0L
    got("wiki").getAs[Long]("tokens_clean") shouldBe 40L
    got("books").getAs[Long]("n_purged") shouldBe 1L
    got("books").getAs[Long]("tokens_clean") shouldBe 0L
    // the eval doc is NOT a train row anywhere
    got.keySet shouldBe Set("web", "wiki", "books")
    // √-flattened weights replay (sorted-sum convention), and the fully-
    // purged source pins w_clean = 0 with shift = −w_raw — visible, not NaN
    val raw = Map("web" -> 60L, "wiki" -> 40L, "books" -> 15L)
    val clean = Map("web" -> 35L, "wiki" -> 40L, "books" -> 0L)
    def sortedSum(m: Map[String, Long]): Double =
      m.values.toSeq.map(v => math.sqrt(v.toDouble)).sorted.sum
    val (sr, sc) = (sortedSum(raw), sortedSum(clean))
    got.foreach { case (src, r) =>
      r.getAs[Long]("w_raw_ppb") shouldBe
        math.floor(1e9 * math.sqrt(raw(src).toDouble) / sr).toLong
      val wc = if (clean(src) == 0) 0L
        else math.floor(1e9 * math.sqrt(clean(src).toDouble) / sc).toLong
      r.getAs[Long]("w_clean_ppb") shouldBe wc
      r.getAs[Long]("shift_ppb") shouldBe wc - r.getAs[Long]("w_raw_ppb")
    }
    // the interaction is real on this frame: web's weight RISES after
    // decon (books' purge removed a whole competitor), books' goes to 0
    got("books").getAs[Long]("shift_ppb") should be < 0L
    got("wiki").getAs[Long]("shift_ppb") should be > 0L
  }

  test("x159 label confusion: a mislabeled cluster loses its members; tie rule keeps twins home") {
    // registry: x159_label_confusion_census
    import spark.implicits._
    def vec(hot: Seq[(Int, Float)]): Seq[Float] =
      (0 until 64).map(i => hot.toMap.getOrElse(i, 0.0f))
    val emb = Seq(
      // label 0: two clean vectors on axis 0
      (1L, vec(Seq(0 -> 1.0f)), 0),
      (2L, vec(Seq(0 -> 1.0f)), 0),
      // label 1: two clean vectors on axis 1
      (3L, vec(Seq(1 -> 1.0f)), 1),
      (4L, vec(Seq(1 -> 1.0f)), 1),
      // label 2: "mislabeled" — one member sits on axis 0, one on axis 1;
      // its centroid is the diagonal, so each member is closer to a
      // FOREIGN centroid (cos 10⁶) than to its own (cos ≈ 707107)
      (5L, vec(Seq(0 -> 1.0f)), 2),
      (6L, vec(Seq(1 -> 1.0f)), 2),
      // label 3: a twin of label 0 — its member ties with label 0's
      // centroid at cos 10⁶; the OWN-label tie rule must keep it home
      (7L, vec(Seq(0 -> 1.0f)), 3)
    ).toDF("vec_id", "embedding", "label")
    val got = SimilarityQueries.labelConfusionCensusOf(emb).orderBy("label")
      .collect()
      .map(r => r.getInt(0) -> ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_miss"),
        r.getAs[Long]("miss_ppm"), r.getAs[Int]("top_confused_label")))).toMap
    got(0) shouldBe ((2L, 0L, 0L, -1))  // clean, loses nothing
    got(1) shouldBe ((2L, 0L, 0L, -1))
    // label 2 loses BOTH members; the mode tie (one to 0, one to 1)
    // breaks toward the smaller label
    got(2) shouldBe ((2L, 2L, 1000000L, 0))
    // the twin ties at cos 10⁶ with label 0's centroid — own wins
    got(3) shouldBe ((1L, 0L, 0L, -1))
  }
}
