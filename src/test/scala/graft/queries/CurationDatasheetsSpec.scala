package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-18 curation datasheets: x149 (DSIR importance gap), x150 (label
  * centroid census), x151 (gate ablation), x152 (repeat-budget sweep),
  * x153 (source-LM divergence) — driver replays on engineered frames plus
  * the cross-query reconciliation pins. */
class CurationDatasheetsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def good40(prefix: String): String =
    "the a " + (1 to 38).map(i => f"$prefix${i}%04d").mkString(" ")

  test("x149 dsir importance ≡ driver replay; target-like positive, alien negative, 1-token excluded") {
    import spark.implicits._
    // registry: x149_dsir_importance
    // s1 doc 1 PASSES the gate (it IS the target); doc 2 shares its
    // CONTEXTS but fans them out to other successors (and fails the gate:
    // no stop words), so the corpus model halves the target's transition
    // probabilities while the target model stays sure → doc 1 gap > 0;
    // s2's vocabulary is disjoint from the target → every transition
    // unseen → ft = 0 → gap < 0; s3 has only a 1-token doc → no row
    val dd = Seq(
      (1L, "s1", good40("w")),
      (2L, "s1", (1 to 29).flatMap(i => Seq(f"w${i}%04d", f"x${i}%04d")).mkString(" ")),
      (3L, "s2", (1 to 30).map(i => f"z${i}%04d").mkString(" ")),
      (4L, "s3", "solo")
    ).toDF("doc_id", "source", "text")
    val got = TextQueries.dsirImportanceOf(dd).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // driver replay: pass comes from the independently-specced gate; both
    // bigram models and the gap arithmetic re-derived from scratch
    val pass = TextQueries.qualityGateOf(dd.select($"doc_id", $"text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Int]("pass") == 1)).toMap
    pass(1L) shouldBe true // fixture premise: doc 1 IS the target
    pass(2L) shouldBe false
    val raw = dd.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bigrams = raw.toSeq.flatMap { case (id, src, t) =>
      t.split(" ").toSeq.sliding(2).filter(_.length == 2)
        .map(p => (id, src, p.head, p(1))).toSeq
    }
    val c2 = bigrams.groupBy(b => (b._3, b._4)).view.mapValues(_.size).toMap
    val c1 = bigrams.groupBy(_._3).view.mapValues(_.size).toMap
    val tb = bigrams.filter(b => pass(b._1))
    val t2 = tb.groupBy(b => (b._3, b._4)).view.mapValues(_.size).toMap
    val t1 = tb.groupBy(_._3).view.mapValues(_.size).toMap
    val nTok = raw.toSeq.map(r => (r._1, r._3.trim.split("\\s+").length.toLong)).toMap
    val perDoc = bigrams.groupBy(b => (b._1, b._2)).toSeq.map { case ((id, src), bs) =>
      val fcs = bs.map(b => math.floor(c2((b._3, b._4)).toDouble / c1(b._3) * 1e6).toLong)
      val fts = bs.map(b => (t1.get(b._3), t2.get((b._3, b._4))) match {
        case (Some(d), Some(n)) => math.floor(n.toDouble / d * 1e6).toLong
        case _ => 0L
      })
      (id, src, fts.sum / bs.size - fcs.sum / bs.size)
    }
    val expected = perDoc.groupBy(_._2).toSeq.map { case (src, ds) =>
      val sel = ds.filter(_._3 > 0)
      (src, ds.size.toLong, sel.size.toLong, sel.map(d => nTok(d._1)).sum,
        (ds.map(_._3 + 1000000L).sum / ds.size) - 1000000L)
    }.sortBy(_._1)
    got.toSeq shouldBe expected

    val bySrc = got.map(g => g._1 -> g).toMap
    bySrc("s1")._2 shouldBe 2L
    bySrc("s2")._5 should be < 0L  // alien vocabulary: strictly anti-target
    bySrc("s2")._3 shouldBe 0L     // nothing selected
    got.map(_._1) should not contain "s3" // 1-token doc: no transitions
    // the target doc itself scores positive (its transitions dominate the
    // target model) and is selected with its full x112 mass
    bySrc("s1")._3 should be >= 1L
    bySrc("s1")._4 should be >= 40L
  }

  test("x150 label centroid census ≡ driver replay on a 4-dim hand frame; junk label reads loose") {
    import spark.implicits._
    // registry: x150_label_centroid_census
    // label 0: two orthogonal unit vectors (loose cluster — cos to own
    // centroid = cos 45° each); label 1: two identical vectors (tight:
    // cos = 1); the engine is dim-generic even though the oracle pins 64
    val dd = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 0),
      (3L, Array(0f, 0f, 1f, 0f), 1),
      (4L, Array(0f, 0f, 1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = SimilarityQueries.labelCentroidCensusOf(dd).orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // driver replay in the same ppm-integer space
    def cosPpm(a: Seq[Long], b: Seq[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      math.round(dot / (math.sqrt(a.map(x => x * x).sum.toDouble)
        * math.sqrt(b.map(x => x * x).sum.toDouble)) * 1e6)
    }
    val vp = Map(
      1L -> Seq(1000000L, 0L, 0L, 0L), 2L -> Seq(0L, 1000000L, 0L, 0L),
      3L -> Seq(0L, 0L, 1000000L, 0L), 4L -> Seq(0L, 0L, 1000000L, 0L))
    val c0 = Seq(500000L, 500000L, 0L, 0L)
    val c1 = Seq(0L, 0L, 1000000L, 0L)
    val g = Seq(250000L, 250000L, 500000L, 0L)
    val exp0 = Seq(cosPpm(vp(1L), c0), cosPpm(vp(2L), c0))
    got(0) shouldBe ((0, 2L,
      (exp0.map(_ + 1000000L).sum / 2) - 1000000L, exp0.min, cosPpm(c0, g)))
    got(1) shouldBe ((1, 2L, cosPpm(vp(3L), c1), cosPpm(vp(3L), c1), cosPpm(c1, g)))
    // the intended read: the tight label means ~10⁶, the loose one ~707107
    got(1)._3 shouldBe 1000000L
    got(0)._3 should be < 710000L
  }

  test("x150 zero-norm guard: an all-zero vector raises the named domain error instead of a silent NaN→0") {
    import spark.implicits._
    // registry: x150_label_centroid_census (r18 self-review finding: the
    // DuckDB oracle errors on CAST(NaN AS BIGINT) while non-ANSI Spark
    // casts NaN to a silent 0 — the engine must raise the SAME class of
    // error in both regimes, naming the operand)
    val dd = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 0f, 0f, 0f), 0) // failed encode: zero norm
    ).toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      SimilarityQueries.labelCentroidCensusOf(dd).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    withClue(messages(e).mkString(" | ")) {
      messages(e).exists(_.contains("zero-norm operand")) shouldBe true
    }
  }

  test("x151 gate ablation: one doc per only-one-rule class + a combo doc land in exact (fail, only, cascade, mass) cells") {
    import spark.implicits._
    // registry: x151_gate_ablation
    val onlyLen = "the a " + (1 to 8).map(i => f"w${i}%04d").mkString(" ")   // 10 words
    val onlyWlen = "the a " + (1 to 28).map(i => f"w${i}%02d").mkString(" ") // 3-char words → mean 2.93
    val onlyRep = "the a " + (1 to 14).flatMap(_ => Seq("qqqqq", "ppppp")).mkString(" ")
    val onlyStop = (1 to 30).map(i => f"v${i}%04d").mkString(" ")
    val combo = "zz yy"                       // fails len AND wlen AND stop
    val dd = Seq(
      (1L, "s1", good40("w")),                // passes all
      (2L, "s1", onlyLen), (3L, "s1", onlyWlen),
      (4L, "s1", onlyRep), (5L, "s1", onlyStop),
      (6L, "s1", combo),
      (7L, "s2", good40("u"))                 // a clean source: all-zero rows
    ).toDF("doc_id", "source", "text")
    // fixture premise: each "only" doc fails exactly its rule
    val flags = TextQueries.qualityGateOf(dd.select($"doc_id", $"text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("r_len"), r.getAs[Int]("r_wlen"),
          r.getAs[Int]("r_rep"), r.getAs[Int]("r_stop")))).toMap
    flags(1L) shouldBe ((1, 1, 1, 1))
    flags(2L) shouldBe ((0, 1, 1, 1))
    flags(3L) shouldBe ((1, 0, 1, 1))
    flags(4L) shouldBe ((1, 1, 0, 1))
    flags(5L) shouldBe ((1, 1, 1, 0))
    flags(6L) shouldBe ((0, 0, 1, 0))

    val got = TextQueries.gateAblationOf(dd).orderBy("source", "rule").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    def tok(t: String): Long = t.trim.split("\\s+").length.toLong
    got shouldBe Seq(
      // s1 — len: docs 2 and 6 fail; only doc 2 fails len alone; both
      // cascade to len (it is first); mass = their token masses
      ("s1", "len", 2L, 1L, 2L, tok(onlyLen) + tok(combo)),
      ("s1", "rep", 1L, 1L, 1L, tok(onlyRep)),
      ("s1", "stop", 2L, 1L, 1L, tok(onlyStop) + tok(combo)),
      ("s1", "wlen", 2L, 1L, 1L, tok(onlyWlen) + tok(combo)),
      ("s2", "len", 0L, 0L, 0L, 0L),
      ("s2", "rep", 0L, 0L, 0L, 0L),
      ("s2", "stop", 0L, 0L, 0L, 0L),
      ("s2", "wlen", 0L, 0L, 0L, 0L))
  }

  test("x152 budget sweep: the 3.8x rung IS x146 row for row; quotas monotone in budget; 7.6x saturates everything") {
    import spark.implicits._
    // registry: x152_repeat_budget_sweep / x146_repeat_decay
    val d = "/root/testdata/sf0.001"
    val sweep = TextQueries.repeatBudgetSweep.run(spark, d).collect()
      .map(r => ((r.getInt(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))).toMap
    val x146 = TextQueries.repeatDecay.run(spark, d).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    // the shipped recipe is EXACTLY the 38-rung of the sweep
    x146.foreach { case (src, row) => sweep((38, src)) shouldBe row }
    // per source: quota monotone in budget; 7.6x > 4x-cap total ⇒ all saturated
    x146.keys.foreach { src =>
      sweep((19, src))._3 should be <= sweep((38, src))._3
      sweep((38, src))._3 should be <= sweep((76, src))._3
      sweep((76, src))._5 shouldBe 1
      sweep((76, src))._3 shouldBe sweep((76, src))._2 // quota = cap
    }
    // 1.9x is under-supplied relative to 3.8x: strictly fewer saturated
    val sat = (b: Int) => x146.keys.count(src => sweep((b, src))._5 == 1)
    sat(19) should be <= sat(38)
    // feasible budgets spend within (B - |sources|, B]: replay the bound
    val supplyTot = x146.values.map(_._1).sum
    val spent19 = x146.keys.map(src => sweep((19, src))._3).sum
    spent19 should be <= supplyTot * 19L / 10L
    spent19 should be > supplyTot * 19L / 10L - x146.size - 4L // floor slack
  }

  test("x154 token accounting: masses reconcile with x105/x129; quotas and shift replay from the collected masses") {
    // registry: x154_token_accounting / x105_bpe_compression / x129_gated_mixture
    val d = "/root/testdata/sf0.001"
    val got = TextQueries.tokenAccounting.run(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // cross-family mass reconciliation: the ws mass IS x129's n_tokens
    // (same x112 count), the bpe mass IS x105's n_tokens (same kernel +
    // merge table — x105 drops zero-token DOCS from n_docs but sums the
    // same tokens)
    val x129 = TextQueries.mixtureGated.run(spark, d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens")).toMap
    val x105 = TextQueries.bpeCompression.run(spark, d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens")).toMap
    got.view.mapValues(_._1).toMap shouldBe x129
    got.view.mapValues(_._2).toMap shouldBe x105
    // quota + shift arithmetic replays from the masses alone
    val sws = got.values.toSeq.map(v => math.sqrt(v._1.toDouble)).sorted.sum
    val sbpe = got.values.toSeq.map(v => math.sqrt(v._2.toDouble)).sorted.sum
    got.foreach { case (src, (ws, bpe, fert, wsQ, bpeQ, shift)) =>
      fert shouldBe bpe * 1000000L / ws
      wsQ shouldBe math.floor(1e9 * math.sqrt(ws.toDouble) / sws).toLong
      bpeQ shouldBe math.floor(1e9 * math.sqrt(bpe.toDouble) / sbpe).toLong
      shift shouldBe (if (wsQ == 0) 0L else bpeQ * 1000000L / wsQ - 1000000L)
    }
    // non-vacuity: fertility differs across sources, so the unit choice
    // moves SOME quota (the read the table exists for)
    got.values.map(_._6).toSet.size should be > 1
  }

  test("x155 contamination by suite ≡ full driver replay (md5 split/suite ladders, 5-gram hits); every (suite, source) cell present") {
    import spark.implicits._
    // registry: x155_contamination_by_suite
    val d = "/root/testdata/sf0.001"
    val got = TextQueries.contaminationBySuite.run(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val raw = graft.Tables.documents(spark, d)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def suiteOf(c: Char): String =
      if (c <= '4') "suiteA" else if (c <= '9') "suiteB" else "suiteC"
    val meta = raw.toSeq.map { case (id, src, _) =>
      val h = md5hex(id)
      (id, src, if (h(0) <= 'd') "train" else "test", suiteOf(h(1)))
    }
    val grams = raw.toSeq.map { case (id, _, t) =>
      val w = t.split(" ").toSeq
      id -> w.sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSet
    }.toMap
    val testGramsBySuite = meta.filter(_._3 == "test").groupBy(_._4)
      .view.mapValues(_.flatMap(m => grams(m._1)).toSet).toMap
    val suites = Seq("suiteA", "suiteB", "suiteC")
    val expected = (for {
      s <- suites
      (src, ms) <- meta.filter(_._3 == "train").groupBy(_._2)
    } yield {
      val hits = ms.count(m => grams(m._1).exists(testGramsBySuite.getOrElse(s, Set()).contains))
      (s, src) -> ((ms.size.toLong, hits.toLong, hits.toLong * 1000000L / ms.size))
    }).toMap
    got shouldBe expected
    // every (suite, source) cell exists — zero rows are auditable
    val nSources = meta.filter(_._3 == "train").map(_._2).distinct.size
    got.size shouldBe 3 * nSources
    // non-vacuity: the corpus has planted dups, so SOME cell is nonzero
    got.values.map(_._2).sum should be > 0L
  }

  test("x156 dedup survivorship: counts reconcile with x119/x64; ppm arithmetic replays; survivors never exceed docs") {
    // registry: x156_dedup_survivorship / x119_cluster_size_hist / x64_quality_gate
    val d = "/root/testdata/sf0.001"
    val got = TextQueries.dedupSurvivorship.run(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // Σ n_surv over sources = the chain's cluster count (x119's Σ n_clusters)
    val nClusters = TextQueries.clusterSizeHist.run(spark, d).collect()
      .map(_.getAs[Long]("n_clusters")).sum
    got.map(_._4).sum shouldBe nClusters
    // Σ n_pass = x64's corpus pass count (the x147 reconciliation)
    val gatePass = TextQueries.qualityGateOf(
      graft.Tables.documents(spark, d).select("doc_id", "text"))
      .agg(org.apache.spark.sql.functions.sum("pass")).head().getLong(0)
    got.map(_._3).sum shouldBe gatePass
    got.foreach { case (_, nDocs, nPass, nSurv, nSurvPass, ppmAll, ppmSurv, delta) =>
      nSurv should be <= nDocs
      nSurvPass should be <= nPass
      ppmAll shouldBe nPass * 1000000L / nDocs
      ppmSurv shouldBe (if (nSurv == 0) 0L else nSurvPass * 1000000L / nSurv)
      delta shouldBe ppmSurv - ppmAll
    }
    // non-vacuity: dedup removed SOMETHING somewhere
    got.map(t => t._2 - t._4).sum should be > 0L
  }

  test("x153 source-lm divergence: disjoint-vocab source diverges zero; skewed shared-context sources read apart") {
    import spark.implicits._
    // registry: x153_source_lm_divergence
    // sU's vocabulary appears nowhere else → its source model IS the
    // corpus model on its rows → gap exactly 0. sA/sB share context x
    // with opposite successors → corpus halves them, each source is
    // sure → |gap| = 500000 on the x-transitions, 0 on the returns.
    val dd = Seq(
      (1L, "sA", "x a x a x a"),
      (2L, "sB", "x b x b x b"),
      (3L, "sU", "u1 u2 u1 u2")
    ).toDF("doc_id", "source", "text")
    val got = TextQueries.sourceLmDivergenceOf(dd).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // sA: 5 transitions (x→a ×3 gap +5e5; a→x ×2 gap 0) → abs mean
    // 1500000/5 = 300000; signed mean the same (all gaps ≥ 0)
    got shouldBe Seq(
      ("sA", 5L, 300000L, 300000L),
      ("sB", 5L, 300000L, 300000L),
      ("sU", 3L, 0L, 0L))
  }
}
