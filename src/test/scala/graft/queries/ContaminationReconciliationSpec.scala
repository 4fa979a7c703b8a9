package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The contamination family is FOUR views of ONE measurement — x35
  * (doc-level train×test gram pairs), x125 (pack-level, including
  * boundary-crossing grams), x136 (near-dup halo expansion), x155
  * (per-benchmark-suite census) — all reading eval 5-grams under the same
  * md5 split ladder. Nothing structurally stops one of them drifting to
  * its own gram rule or split and silently measuring something else, so
  * this spec (the MixtureReconciliationSpec precedent, r18 stretch item)
  * pins them to each other on ONE engineered frame where every
  * reconciliation identity is hand-computable:
  *
  *   - x136's 'direct' set ≡ x35's flagged train docs (halo strictly extra);
  *   - Σ x155 cell hits ≡ |x35 flagged docs| when each doc hits one suite;
  *   - Σ x125 pack hits ≡ Σ x35 n_shared when no gram crosses a boundary
  *     and each shared gram occurs once per doc;
  *   - the contaminated SOURCES agree across x125/x155 and x35.
  */
class ContaminationReconciliationSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  private def md5hex(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("x35 ≡ x136.direct; Σ x155 hits ≡ x35 docs; Σ x125 hits ≡ x35 pairs; sources agree") {
    // registry: x35_text_decontaminate
    // registry: x125_pack_decontaminate
    // registry: x136_contamination_halo
    // registry: x155_contamination_by_suite
    import spark.implicits._
    val ids = (1L to 2000L)
    val trainIds = ids.filter(md5hex(_).charAt(0) <= 'd')
    // suites ride md5 digit 2 of TEST ids: ≤'4' A, ≤'9' B, else C
    val testA = ids.filter(i => md5hex(i).charAt(0) > 'd' && md5hex(i).charAt(1) <= '4').head
    val testC = ids.filter(i => md5hex(i).charAt(0) > 'd' && md5hex(i).charAt(1) > '9').head
    val Seq(tA, tB, tClean, tH1, tH2) = trainIds.take(5).toSeq

    val gramA = "a1 a2 a3 a4 a5" // hits suite A via testA
    val gramC = "c1 c2 c3 c4 c5" // hits suite C via testC
    def toks(p: String, n: Int): String = (1 to n).map(i => s"$p$i").mkString(" ")
    // distinct prefixes: only H1/H2 may near-dup-collide (the halo pair)
    val dd = Seq(
      (tA, "web", s"${toks("w", 40)} $gramA"),   // direct, suite A
      (tH1, "web", s"${toks("p", 60)} $gramA"),  // direct, suite A; near-dup rep
      (tH2, "web", s"${toks("p", 60)} h1 h2 h3 h4 h5"), // HALO: gram mutated away
      (tB, "wiki", s"${toks("k", 40)} $gramC"),  // direct, suite C
      (tClean, "books", toks("z", 40)),          // clean train doc
      (testA, "eval", gramA),                    // benchmark docs: exactly one
      (testC, "eval", gramC)                     //   distinct 5-gram each
    ).toDF("doc_id", "source", "text")
    val docsOnly = dd.select("doc_id", "text")

    // ---- x35: the ground truth this fixture hand-computes
    val x35 = TextQueries.textDecontaminateOf(docsOnly).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    x35 shouldBe Set((tA, testA, 1L), (tH1, testA, 1L), (tB, testC, 1L))
    val flagged = x35.map(_._1)
    val srcOf = Map(tA -> "web", tH1 -> "web", tH2 -> "web", tB -> "wiki")

    // ---- x136 ≡ x35 + the halo, never less, never a different direct set
    val halo = TextQueries.contaminationHaloOf(docsOnly).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    halo.filter(_._2 == "direct").keySet shouldBe flagged
    halo.filter(_._2 == "halo").keySet shouldBe Set(tH2)

    // ---- x155: each contaminated doc hits exactly ONE suite here, so the
    // census's total hit count IS x35's flagged-doc count, cell by cell
    val cells = TextQueries.contaminationBySuiteOf(dd).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_train"), r.getAs[Long]("n_hit"))).toMap
    cells.values.map(_._2).sum shouldBe flagged.size.toLong
    cells(("suiteA", "web")) shouldBe ((3L, 2L))  // tA + tH1 hit; tH2 clean
    cells(("suiteC", "wiki")) shouldBe ((1L, 1L))
    cells.filterKeys(k => k != ("suiteA", "web") && k != ("suiteC", "wiki"))
      .values.map(_._2).toSet shouldBe Set(0L)
    // every (suite, train-source) cell present — the auditable zeros
    cells.keySet shouldBe (for {
      s <- Set("suiteA", "suiteB", "suiteC")
      src <- Set("web", "wiki", "books")
    } yield (s, src))

    // ---- x125: no gram crosses a pack boundary on this frame and each
    // shared gram occurs once per flagged doc, so pack-level hits
    // reconcile EXACTLY with x35's pair count — and the contaminated
    // sources are the same set three ways
    val packs = TextQueries.packDecontaminateOf(dd).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_hits"), r.getAs[Long]("n_boundary_hits")))
    // .toSeq first: x35 is a Set, and Set.map over the n_shared projection
    // would dedupe equal counts before the sum (the recurring replay trap)
    packs.map(_._2).sum shouldBe x35.toSeq.map(_._3).sum
    packs.map(_._3).sum shouldBe 0L
    packs.map(_._1).toSet shouldBe flagged.map(srcOf)
    cells.collect { case ((_, src), (_, h)) if h > 0 => src }.toSet shouldBe
      flagged.map(srcOf)
  }
}
