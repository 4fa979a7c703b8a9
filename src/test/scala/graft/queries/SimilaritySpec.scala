package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Consistency checks across the three top-k strategies: brute force is the
  * exact baseline; LSH and IVF must score identically on every pair they
  * return (they may only *miss* pairs — recall, not correctness, is the
  * approximate part). */
class SimilaritySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(q: QueryDef): Map[(Long, Long), Double] =
    q.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos"))
      .toMap

  // registry: x12_sim_brute_topk
  private lazy val brute = SimilarityQueries.simBruteTopk.run(spark, dir)
    .collect()
    .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos"))
    .toMap

  // full exact ranking per query (not just top-5) for score cross-checking
  private lazy val fullExact: Map[(Long, Long), Double] = {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(aggregate(zip_with(col("embedding"), col("q_emb"),
            (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x)
          / (sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
              lit(0.0), (a, x) => a + x))
            * sqrt(aggregate(transform(col("q_emb"), x => x.cast("double") * x.cast("double")),
              lit(0.0), (a, x) => a + x))), 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("brute-force top-k: 5 ranked hits per query, scores match full ranking") {
    brute.size shouldBe 50 // 10 queries × 5
    brute.foreach { case (k, cos) => fullExact(k) shouldBe cos +- 1e-9 }
  }

  test("LSH candidates score identically to exact cosine") {
    // registry: x13_sim_lsh_topk
    val lsh = pairs(SimilarityQueries.simLshTopk)
    lsh should not be empty
    lsh.foreach { case (k, cos) => fullExact(k) shouldBe cos +- 1e-9 }
  }

  test("IVF candidates score identically to exact cosine; finds neighbors") {
    // registry: x17_sim_ivf_topk
    val ivf = pairs(SimilarityQueries.simIvfTopk)
    ivf should not be empty
    ivf.foreach { case (k, cos) => fullExact(k) shouldBe cos +- 1e-9 }
    // every query that returns anything returns a full ranked block
    val perQuery = ivf.keys.groupBy(_._1).view.mapValues(_.size).toMap
    all(perQuery.values) should be <= 5
    // PER-QUERY recall floor vs the exact top-5: a systematically wrong
    // cell assignment that still surfaces one good neighbor per query
    // passed the old gate (exact-cos agreement + non-empty); it fails this
    val perQueryRecall = brute.keys.groupBy(_._1).map { case (q, ks) =>
      q -> ks.count(ivf.contains).toDouble / ks.size
    }
    withClue(s"per-query recall@5 vs brute: $perQueryRecall: ") {
      perQueryRecall.values.min should be >= 0.6
    }
  }

  test("IvfPinned artifact is in sync with the corpus it was trained on") {
    import org.apache.spark.sql.functions.{bit_xor, col, count, lit, xxhash64}
    // same fingerprint IvfPin emits: a regenerated sf0.01 corpus desyncs
    // from the committed centroids and this fails loudly (the hash oracle
    // alone would stay self-consistently green over a stale index)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val fp = emb.agg(count(lit(1)), bit_xor(xxhash64(col("vec_id")))).head()
    fp.getLong(0) shouldBe IvfPinned.corpusRows
    fp.getLong(1) shouldBe IvfPinned.corpusIdXor
    IvfPinned.centroids.size shouldBe IvfPinned.nCells
    IvfPinned.centroids.foreach(_.size shouldBe 64)
  }

  test("PqPinned artifact is in sync with the corpus it was trained on") {
    import org.apache.spark.sql.functions.{bit_xor, col, count, lit, xxhash64}
    // same fingerprint PqPin emits — a regenerated corpus desyncs from the
    // committed codebooks and fails here instead of scoring hash-green
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val fp = emb.agg(count(lit(1)), bit_xor(xxhash64(col("vec_id")))).head()
    fp.getLong(0) shouldBe PqPinned.corpusRows
    fp.getLong(1) shouldBe PqPinned.corpusIdXor
    PqPinned.nSub * PqPinned.subDim shouldBe 64 // subspaces tile the embedding
    PqPinned.codebooks.size shouldBe PqPinned.nSub
    PqPinned.codebooks.foreach { cb =>
      cb.size shouldBe PqPinned.nCodes
      cb.foreach(_.size shouldBe PqPinned.subDim)
    }
  }

  test("x68 IVF-PQ: exact-rerank top-5 holds the recall floor vs brute") {
    val sf = "/root/testdata/sf0.01"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(r.fieldIndex("q_id")),
        r.getLong(r.fieldIndex("vec_id")))).toSet
    val brute = pairs(SimilarityQueries.simBruteTopk.run(spark, sf))
    // registry: x68_pq_topk
    val out = SimilarityQueries.simPqTopk.run(spark, sf).collect()
    out.length shouldBe 50 // 10 queries × top-5
    // per-query contract: ranks 1..5, exact-cosine scores non-increasing
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      rows.map(_.getInt(3)).sorted shouldBe (1 to 5)
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      byRank.zip(byRank.tail).foreach { case (a, b) => a should be >= b }
    }
    val got = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    info(f"x68 recall@5 vs brute: $recall%.2f (measured 0.64 on the shipped corpus)")
    recall should be >= 0.6
  }

  test("x17 IVF on a planted-cluster corpus: recall@5 ≥ 0.6 at a PRUNING probe count") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The shipped corpus is isotropic — IVF's worst case, where nProbe 8/16
    // reads half the corpus just to clear the floor. This fixture has the
    // structure IVF exists for: 16 well-separated gaussian clusters of 30
    // points. The gate probes TWO of 16 cells (1/8 of the corpus) and must
    // still clear the same per-query floor — proving the index prunes,
    // not merely that it fails gracefully.
    val rnd = new scala.util.Random(11L)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 480).map { i =>
      i.toLong -> centers(i % 16).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val centroids = SimilarityQueries.trainIvf(df, nCells = 16)
    val got = SimilarityQueries
      .ivfTopkOf(df, centroids, nProbe = 2, isQuery = col("vec_id") < 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    // exact top-5 per query, ranked like the engine: rounded cosine desc,
    // vec_id tiebreak
    def cosLocal(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val byId = vecs.toMap
    val recalls = (0L until 10L).map { q =>
      val top5 = vecs.collect { case (id, v) if id != q =>
        (BigDecimal(cosLocal(byId(q), v)).setScale(6, BigDecimal.RoundingMode.HALF_UP), id)
      }.sortBy { case (c, id) => (-c, id) }.take(5).map(_._2).toSet
      q -> top5.count(id => got.contains((q, id))).toDouble / top5.size
    }.toMap
    withClue(s"per-query recall@5 at nProbe=2 on planted clusters: $recalls: ") {
      recalls.values.min should be >= 0.6
    }
  }

  test("x21 banded-LSH pair dedup: planted duplicates are recovered") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 100 seeded random unit-ish vectors + 20 perturbed copies (ids 100+i is
    // a near-dup of id i, cosine ≈ 0.97-0.99); random-random pairs sit far
    // below the 0.9 threshold, so the true-pair set is exactly the plants
    // (verified from exact cosines below, not assumed).
    val rnd = new scala.util.Random(7L)
    val base = (0 until 100).map(i => i.toLong -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val dups = (0 until 20).map { i =>
      val (_, v) = base(i)
      (100L + i) -> v.map(x => x + 0.12f * rnd.nextGaussian().toFloat)
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    def cosLocal(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val vecs = (base ++ dups).toMap
    val truePairs = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
      if cosLocal(vecs(a), vecs(b)) >= 0.9
    } yield (a, b)).toSet
    truePairs.size should be >= 15 // the plants really are near-dups
    val found = SimilarityQueries.embeddingNearDupPairs(df, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet // (id_a, id_b)
    // precision is 1.0 by construction (exact verify); recall is the gate
    found.subsetOf(truePairs) shouldBe true
    val recall = (found & truePairs).size.toDouble / truePairs.size
    info(f"x21 planted recall: $recall%.2f (${found.size}/${truePairs.size})")
    recall should be >= 0.8
  }

  test("recall report: IVF/LSH vs brute (informational floor)") {
    val lsh = pairs(SimilarityQueries.simLshTopk).keySet
    val ivf = pairs(SimilarityQueries.simIvfTopk).keySet
    val b = brute.keySet
    val lshRecall = (lsh & b).size.toDouble / b.size
    val ivfRecall = (ivf & b).size.toDouble / b.size
    info(f"recall@5 vs brute — lsh: $lshRecall%.2f  ivf: $ivfRecall%.2f")
    // deterministic fixture (seeded KMeans, fixed hyperplanes) → stable
    // numbers: measured ivf 0.82 (nProbe=8), lsh 0.10. Floors guard
    // regressions while allowing Spark-version drift.
    ivfRecall should be >= 0.6
    lshRecall should be > 0.0
  }

  test("x65 cell census ≡ driver-side recomputation from the pinned centroids") {
    val sf = "/root/testdata/sf0.01" // the corpus the pinned index is synced to
    // registry: x65_ivf_cells
    val out = SimilarityQueries.simIvfCells.run(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getDouble(5))))
      .toMap
    val emb = graft.Tables.embeddings(spark, sf)
      .collect()
      .map(r => (r.getSeq[Float](r.fieldIndex("embedding")).toVector, r.getAs[Int]("label")))
    // same arithmetic as the engine/oracle: |c|² − 2·(x·c), sequential fold,
    // argmin tie-broken by cell id
    val cellOf: Seq[Float] => Int = { v =>
      IvfPinned.centroids.zipWithIndex.map { case (c, i) =>
        val cn2 = c.map(x => x * x).sum
        val d = cn2 - 2.0 * (0 until 64).map(j => v(j).toDouble * c(j)).sum
        (d, i)
      }.min._2
    }
    val assigned = emb.map { case (v, l) => (cellOf(v), l) }
    val expected = assigned.groupBy(_._1).map { case (cell, rows) =>
      val byLabel = rows.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      val (majLabel, majN) = byLabel.sortBy { case (l, n) => (-n, l) }.head
      val nVecs = rows.length.toLong
      cell -> ((nVecs, byLabel.length.toLong, majLabel, majN,
        majN.toDouble / nVecs)) // raw IEEE quotient (x62 lesson)
    }
    out shouldBe expected
    // census invariants: every vector lands somewhere, purity is sane
    out.values.map(_._1).sum shouldBe emb.length.toLong
    out.values.foreach { case (n, nl, _, majN, purity) =>
      majN should be <= n
      nl should be >= 1L
      purity should (be > 0.0 and be <= 1.0)
    }
  }

  test("x67 SemDeDup ≡ driver-side recomputation (cells, max-prior cosine, flags)") {
    val sf = "/root/testdata/sf0.01" // the corpus the pinned index is synced to
    // registry: x67_semantic_dedup
    val out = SimilarityQueries.semanticDedup.run(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getInt(3))))
      .toMap
    val emb = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toVector)
      .sortBy(_._1)
    // same arithmetic as the engine/oracle: sequential-fold dot products,
    // |c|² − 2·(x·c) argmin tie-broken by cell, per-pair ROUND(cos, 6)
    // BEFORE the max (round-then-max, the x39 precedent)
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      (0 until 64).map(i => a(i) * b(i)).sum
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = emb.map { case (id, v) => id -> v.map(_.toDouble) }
    val cellOf: Seq[Double] => Int = { v =>
      IvfPinned.centroids.zipWithIndex.map { case (c, i) =>
        (c.map(x => x * x).sum - 2.0 * dot(v, c), i)
      }.min._2
    }
    val assigned = vecs.map { case (id, v) => (id, cellOf(v), v, math.sqrt(dot(v, v))) }
    val expected = assigned.map { case (id, cell, v, nrm) =>
      val priors = assigned.filter { case (pid, pcell, _, _) => pcell == cell && pid < id }
        .map { case (_, _, pv, pnrm) => round6(dot(pv, v) / (pnrm * nrm)) }
      val m = if (priors.isEmpty) -1.0 else priors.max
      id -> ((cell, m, if (m >= SimilarityQueries.x67Tau) 1 else 0))
    }.toMap
    out shouldBe expected
    // SemDeDup invariants: conservation, the earliest vector of every cell
    // is never a dup, and the flag set is non-vacuous both ways
    out.size shouldBe emb.length
    assigned.groupBy(_._2).values.foreach { cellRows =>
      val firstId = cellRows.map(_._1).min
      out(firstId)._3 shouldBe 0 // no earlier same-cell vector to match
    }
    out.values.count(_._3 == 1) should be > 0
    out.values.count(_._3 == 0) should be > 0
  }

  // ---- shared driver-side replay kit for the remaining embedding rows ----

  private def embRows: Array[(Long, Array[Float])] =
    graft.Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

  private def dotF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Spark's round(col, 6) on DoubleType: BigDecimal.valueOf + HALF_UP. */
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def cosF(a: Array[Float], b: Array[Float]): Double =
    r6(dotF(a, b) / (math.sqrt(dotF(a, a)) * math.sqrt(dotF(b, b))))

  /** Cell ranking exactly as nearestCellsBy plans it: ascending
    * (|c|² − 2·x·c, cell) — the struct sort_array comparison order.
    * Centroid-parameterized so the x127 staleness canary can rank through
    * a desynced index. */
  private def probeCellsBy(cents: Seq[Seq[Double]])(e: Array[Float], n: Int): Seq[Int] =
    cents.zipWithIndex.map { case (c, i) =>
      val cn = c.map(x => x * x).sum
      val d = cn - 2.0 * e.zip(c).map { case (x, y) => x.toDouble * y }.sum
      (d, i)
    }.sorted.take(n).map(_._2)

  private def probeCells(e: Array[Float], n: Int): Seq[Int] =
    probeCellsBy(IvfPinned.centroids)(e, n)

  test("x10_emb_norm / x11_emb_pair_cosine: norms and pair cosines replay exactly") {
    val rows = embRows
    val norms = SimilarityQueries.embNorm.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    norms.size shouldBe rows.length
    rows.foreach { case (id, v) =>
      norms(id) shouldBe r6(math.sqrt(dotF(v, v)))
    }
    val byId = rows.toMap
    val pairs = SimilarityQueries.embPairCosine.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs should not be empty
    pairs.foreach { case ((a, b), cos) =>
      b shouldBe a + 1
      cos shouldBe cosF(byId(a), byId(b))
    }
  }

  test("x33_emb_quantize: int8 symmetric quantization replays exactly") {
    val rows = embRows
    val out = SimilarityQueries.embQuantize.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    out.size shouldBe rows.length
    rows.foreach { case (id, v) =>
      val m = v.map(x => math.abs(x.toDouble)).max
      val codes = v.map(x => if (m == 0) 0L else (x.toDouble * 127 / m).toLong)
      val (nDims, scaleMax, sum, mn, mx) = out(id)
      nDims shouldBe v.length
      scaleMax shouldBe r6(m)
      sum shouldBe codes.sum
      mn shouldBe codes.min
      mx shouldBe codes.max
      // int8 range: truncation toward zero keeps every code in [-127, 127]
      mn should be >= -127L
      mx should be <= 127L
    }
  }

  test("x126 ANN recall sweep: per-rung hits replay from scratch; recall monotone; all-cells ≡ brute") {
    val rows = embRows
    val queries = rows.filter(_._1 < 10)
    queries.length shouldBe 10
    val corpusCell: Map[Long, Int] = rows.map { case (id, v) => id -> probeCells(v, 1).head }.toMap

    // exact top-5 per query: ranked by (rounded cos desc, vec_id asc) — the
    // query's own window order
    def top5(cands: Seq[(Long, Double)]): Seq[Long] =
      cands.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    val brute5: Map[Long, Set[Long]] = queries.map { case (qid, qv) =>
      qid -> top5(rows.collect { case (id, v) if id != qid => id -> cosF(v, qv) }.toSeq).toSet
    }.toMap

    // IVF top-5 at nprobe np: candidates are vectors whose assigned cell sits
    // within the first np probe cells of the query (pos < np, 0-based)
    def ivf5(qid: Long, qv: Array[Float], np: Int): Set[Long] = {
      val probed = probeCells(qv, np).toSet
      top5(rows.collect {
        case (id, v) if id != qid && probed(corpusCell(id)) => id -> cosF(v, qv)
      }.toSeq).toSet
    }
    def replayHits(np: Int): Long =
      queries.map { case (qid, qv) => (ivf5(qid, qv, np) & brute5(qid)).size.toLong }.sum

    // registry: x126_ann_recall_sweep
    val out = SimilarityQueries.annRecallSweep.run(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out.keySet shouldBe Set(1, 2, 4, 8)
    Seq(1, 2, 4, 8).foreach { np =>
      val (nq, hits, ppm) = out(np)
      nq shouldBe 10L
      withClue(s"nprobe=$np hit count vs from-scratch replay: ") {
        hits shouldBe replayHits(np)
      }
      hits should be <= 5L * nq
      ppm shouldBe hits * 1000000L / (nq * 5L)
    }
    // the operating curve is monotone non-decreasing in nprobe (a probe
    // superset can only add candidates)
    val recalls = Seq(1, 2, 4, 8).map(np => out(np)._3)
    recalls shouldBe recalls.sorted
    // and probing every cell IS brute force: replay at nprobe = nCells must
    // reproduce the exact top-5 per query (recall 10⁶ by construction)
    queries.foreach { case (qid, qv) =>
      ivf5(qid, qv, IvfPinned.nCells) shouldBe brute5(qid)
    }
  }

  // registry: x127_ann_operating_point
  test("x127 operating point: smallest rung within 90% of best; pin round-trips; a stale index trips the canary") {
    val sweep = SimilarityQueries.annRecallSweep.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxR = sweep.map(_._4).max
    val exp = sweep.filter(t => t._4 * 10 >= maxR * 9).minBy(_._1)
    val out = SimilarityQueries.annOperatingPoint.run(spark, dir).collect()
    out.length shouldBe 1
    val r = out.head
    (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe
      ((exp._1, exp._2, exp._3, exp._4, maxR))

    // the durable pin round-trips: what the serving config reads IS the row
    val path = java.nio.file.Files.createTempDirectory("ann-op").toString + "/pin"
    SimilarityQueries.saveAnnOperatingPoint(spark, dir, path)
    val back = spark.read.parquet(path).collect()
    back.length shouldBe 1
    back.head.getAs[Int]("nprobe") shouldBe exp._1
    back.head.getAs[Long]("recall_ppm") shouldBe exp._4
    back.head.getAs[Long]("max_recall_ppm") shouldBe maxR

    // THE STALENESS CANARY: the number a refresh job watches is recall at
    // the PINNED nprobe. Recompute it from scratch twice — once against the
    // live index (must reproduce the pinned hits exactly) and once against
    // a DESYNCED index (probe ranking through a reversed centroid table —
    // the shape of centroids trained on some other corpus while the cell
    // assignment artifact still reflects this one). The desynced recall
    // must fall below the pin's own 90%-of-best floor: the canary fires.
    val rows = embRows
    val queries = rows.filter(_._1 < 10)
    val corpusCell = rows.map { case (id, v) => id -> probeCells(v, 1).head }.toMap
    def top5(cands: Seq[(Long, Double)]): Set[Long] =
      cands.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    val brute5 = queries.map { case (qid, qv) =>
      qid -> top5(rows.collect { case (id, v) if id != qid => id -> cosF(v, qv) }.toSeq)
    }.toMap
    def hitsThrough(cents: Seq[Seq[Double]]): Long =
      queries.map { case (qid, qv) =>
        val probed = probeCellsBy(cents)(qv, exp._1).toSet
        (top5(rows.collect {
          case (id, v) if id != qid && probed(corpusCell(id)) => id -> cosF(v, qv)
        }.toSeq) & brute5(qid)).size.toLong
      }.sum
    hitsThrough(IvfPinned.centroids) shouldBe exp._3 // live index ≡ the pin
    val staleHits = hitsThrough(IvfPinned.centroids.reverse)
    val stalePpm = staleHits * 1000000L / (exp._2 * 5L)
    withClue(s"stale recall $stalePpm ppm vs pinned ${exp._4} (floor 0.9×$maxR): ") {
      staleHits should be < exp._3
      stalePpm * 10 should be < maxR * 9 // below the pinned floor → canary fires
    }
  }

  // registry: x100_emb_rproj
  test("x145 outlier census ≡ driver-side recomputation (assignment, ppm cosine, census)") {
    val sf = "/root/testdata/sf0.01" // the corpus the pinned index is synced to
    // registry: x145_ann_outlier_census
    val out = SimilarityQueries.annOutlierCensus.run(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
    val emb = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).toVector)
    // same arithmetic as the engine/oracle: sequential double folds, argmin
    // tie-broken by cell, cosine rounded HALF_UP to integer ppm (what
    // Spark's round does via BigDecimal)
    val scored = emb.map { v =>
      IvfPinned.centroids.zipWithIndex.map { case (c, i) =>
        val cn2 = c.map(x => x * x).sum
        val dotv = (0 until 64).map(j => v(j).toDouble * c(j)).sum
        val ne = math.sqrt((0 until 64).map(j => v(j).toDouble * v(j).toDouble).sum)
        val ppm = new java.math.BigDecimal(dotv / (ne * math.sqrt(cn2)) * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
        (cn2 - 2.0 * dotv, i, ppm)
      }.minBy(t => (t._1, t._2))
    }
    val expected = scored.groupBy(_._2).map { case (cell, rows) =>
      val ppms = rows.map(_._3)
      val n = ppms.length.toLong
      val nOut = ppms.count(_ < 150000L).toLong
      cell -> ((n, ppms.map(_ + 1000000L).sum / n - 1000000L, ppms.min,
        nOut, nOut * 1000000L / n))
    }
    out shouldBe expected
    // non-degenerate on the shipped corpus: the threshold splits — some
    // cells carry outliers, some are clean, and every vector is counted
    out.values.map(_._1).sum shouldBe emb.length.toLong
    out.values.map(_._4).sum should be > 0L
    out.values.count(_._4 == 0L) should be > 0
  }

  test("x100 JL projection: pairwise distances survive within JL distortion bounds") {
    val emb = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = SimilarityQueries.embRandomProjection.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getDouble).toArray).toMap
    // consecutive-id pairs (the x11 pairing): squared-distance ratio
    // proj²/orig² should concentrate near 1 — k=8 is coarse, so assert the
    // MEAN lands in a wide-but-meaningful band and no ratio degenerates
    val ratios = emb.keys.toSeq.sorted.sliding(2).collect {
      case Seq(a, b) if emb.contains(b) =>
        def d2(x: Array[Double], y: Array[Double]) =
          x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum
        d2(proj(a), proj(b)) / d2(emb(a), emb(b))
    }.toSeq
    ratios should not be empty
    val mean = ratios.sum / ratios.size
    mean should (be > 0.6 and be < 1.4)
    // the projection is not collapsing: no pair maps to (near-)zero distance
    ratios.min should be > 0.01
  }
}
