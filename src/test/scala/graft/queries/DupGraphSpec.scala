package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Independent recomputation of the round-10 dup-graph queries, driver-side
  * in plain Scala — the in-CI twin of the DuckDB oracle (which CI can't
  * run): x69's five fixed-point PageRank iterations replayed over the
  * collected edge list, x70's membership flags replayed over the collected
  * corpus keys. */
class DupGraphSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("x69: engine ranks equal a driver-side replay of the integer iteration") {
    // registry: x69_dup_pagerank
    val out = TextQueries.dupPagerank.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // independent edge list: the x03 chain replayed in plain Scala over the
    // exact-collapsed reps — 32-hash MinHash, 8 bands of 4, candidates =
    // pairs sharing a band SLICE (the engine band-joins on xxhash64 of the
    // slice; slices collide iff equal up to a ~2^-64 hash collision), then
    // the integer Jaccard admission and ppm weight on the candidate set
    val pairs = replayPairs(dir)

    val edges = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val wout = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = wout.map { case (s, _) => s -> 1000000L }
    for (_ <- 1 to 5) {
      val inbound = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => rank(s) * w / wout(s) }.sum
      }
      rank = rank.map { case (n, _) => n -> (150000L + 85L * inbound(n) / 100L) }
    }
    val expected = rank.toSeq.sortBy(_._1).map { case (n, r) =>
      (n, deg(n), math.round(r / 1e6 * 1e6) / 1e6)
    }
    out.toSeq shouldBe expected
    out.length should be > 0
  }

  test("x69: weighted ranks are NOT uniform on the shipped dup graph") {
    // unweighted PageRank is exactly uniform on the degree-symmetric blobs
    // a near-dup graph is made of — if every rank is 1.0 again, the
    // weighting has silently fallen out of the iteration
    val prs = TextQueries.dupPagerank.run(spark, "/root/testdata/sf0.01")
      .select("pr").collect().map(_.getDouble(0)).distinct
    prs.length should be > 1
  }

  test("x70: engine flags equal a driver-side exact-membership replay") {
    // registry: x70_bloom_dedup
    val out = TextQueries.bloomDedup.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    val keyed = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").distinct.sorted.mkString(" ")))
    val corpusCounts = keyed.filter(_._1 % 10 != 0)
      .groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val expected = keyed.filter(_._1 % 10 == 0).sortBy(_._1).map { case (id, k) =>
      val n = corpusCounts.getOrElse(k, 0L)
      (id, n, if (n > 0) 1 else 0)
    }
    out.toSeq shouldBe expected.toSeq
    out.length should be > 0
  }

  test("x71: tiers are exclusive, account for every incoming doc, and agree with x70/x37") {
    val sf01 = "/root/testdata/sf0.01"
    // registry: x71_ingest_triage
    val t = TextQueries.ingestTriage.run(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // exclusive tiers: per-source counts must sum exactly
    t.foreach { case (src, n, e, nr, nv) =>
      withClue(s"$src: ") { (e + nr + nv) shouldBe n }
    }
    // batch accounting: sources cover the whole incoming split
    val nIncoming = graft.Tables.documents(spark, sf01)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0).count()
    t.map(_._2).sum shouldBe nIncoming
    // tier 1 agrees with x70 (same membership semantics)
    val x70Dups = TextQueries.bloomDedup.run(spark, sf01)
      .filter(org.apache.spark.sql.functions.col("is_dup") === 1).count()
    t.map(_._3).sum shouldBe x70Dups
    // tier 2 is bounded by x37's distinct probe hits (exact-BoW docs that
    // also band-hit count in tier 1, never tier 2)
    // registry: x37_dedup_incremental
    val x37Hits = TextQueries.dedupIncremental.run(spark, sf01)
      .select("doc_id").distinct().count()
    t.map(_._4).sum should be <= x37Hits
    // non-vacuity: every tier is populated on the shipped corpus
    t.map(_._3).sum should be > 0L
    t.map(_._4).sum should be > 0L
    t.map(_._5).sum should be > 0L
  }

  test("x96: engine triangle tallies equal a brute-force replay") {
    // registry: x96_dup_triangles
    val out = TextQueries.dupTriangles.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val pairs = replayPairs(dir).map { case (a, b, _) => (a, b) }
    val edgeSet = pairs.toSet
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- pairs
      (b2, c) <- pairs if b2 == b && edgeSet.contains((a, c))
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, g) => n -> g.size.toLong }
    val expected = deg.toSeq.sortBy(_._1).map { case (n, dg) =>
      val t = triCount(n)
      (n, dg, t, if (dg >= 2) 2000000L * t / (dg * (dg - 1)) else 0L)
    }
    out.toSeq shouldBe expected
    out.length should be > 0
    // non-vacuity: the shipped dup graph has clone cliques, so triangles exist
    out.map(_._3).sum should be > 0L
  }

  test("x72: band-collision histogram + verified mass equal a from-scratch sweep") {
    // registry: x72_lsh_band_stats
    val out = TextQueries.lshBandStats.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val sigs = replaySigs(dir)
    val stats = (for {
      (a, sa, ga) <- sigs
      (b, sb, gb) <- sigs
      if a < b
      nBands = (0 until 8).count(bd => ga.slice(bd * 4, bd * 4 + 4) == gb.slice(bd * 4, bd * 4 + 4))
      if nBands > 0
    } yield {
      val inter = (sa intersect sb).size.toLong
      val uni = sa.size.toLong + sb.size.toLong - inter
      (nBands.toLong, if (inter * 2 >= uni) 1L else 0L)
    }).groupBy(_._1).map { case (nb, rows) =>
      nb -> ((rows.size.toLong, rows.map(_._2).sum))
    }
    out shouldBe stats
    out should not be empty
    // verified mass never exceeds pair mass, and the curve is non-vacuous
    out.foreach { case (_, (pairs, ok)) => ok should be <= pairs }
    out.values.map(_._2).sum should be > 0L
  }

  test("x73: hub-removal attribution equals a sequential replay over the verified pairs") {
    // registry: x73_hub_removal
    val out = TextQueries.hubRemoval.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))

    // hubs: top-10 of the (already replay-verified) x69 ranking by
    // (pr desc, doc_id asc); attribution: every verified pair counts once,
    // for its better-ranked hub endpoint
    val ranks = TextQueries.dupPagerank.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val hubs = ranks.sortBy { case (id, _, pr) => (-pr, id) }.take(10).zipWithIndex
      .map { case ((id, deg, pr), i) => (i + 1, id, deg, pr) }
    val hubRank = hubs.map { case (rk, id, _, _) => id -> rk }.toMap
    val removed = replayPairs(dir)
      .map { case (a, b, _) => math.min(hubRank.getOrElse(a, 999), hubRank.getOrElse(b, 999)) }
      .filter(_ < 999)
      .groupBy(identity).map { case (rk, g) => rk -> g.size.toLong }
    val expected = hubs.map { case (rk, id, deg, pr) =>
      (rk, id, deg, pr, removed.getOrElse(rk, 0L))
    }
    out.toSeq shouldBe expected.toSeq
    // the simulation is sequential-exclusive: Σ pairs_removed = pairs
    // touching ANY hub (each counted once)
    out.map(_._5).sum shouldBe removed.values.sum
    out.map(_._5).sum should be > 0L
  }

  test("x133: the threshold curve equals a from-scratch sweep over the replayed pairs") {
    // registry: x133_dedup_threshold_curve
    val out = TextQueries.dedupThresholdCurve.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val pairs = replayPairs(dir) // (a, b, w_ppm) — the verified J≥0.5 set
    val nReps = replaySigs(dir).size.toLong
    val taus = Seq(500000L, 600000L, 700000L, 800000L)
    out.keySet shouldBe taus.toSet
    taus.foreach { tau =>
      val keep = pairs.filter(_._3 >= tau)
      val docs = keep.flatMap(p => Seq(p._1, p._2)).toSet
      withClue(s"tau=$tau: ") {
        out(tau) shouldBe ((keep.size.toLong, docs.size.toLong, nReps,
          docs.size.toLong * 1000000L / nReps))
      }
    }
    // the curve is monotone non-increasing in tau, and non-vacuous at the
    // admission point (the shipped corpus carries real near-dups at 0.5)
    val byTau = taus.map(out(_)._1)
    byTau.zip(byTau.tail).foreach { case (a, b) => a should be >= b }
    out(500000L)._1 should be > 0L
  }

  /** Exact-collapsed reps with their shingle sets and 32-hash MinHash
    * signatures, replayed in plain Scala — the shared front of the x03
    * chain (minhashSignaturesOf). */
  private def replaySigs(dir: String): Seq[(Long, Set[Long], IndexedSeq[Long])] = {
    val reps = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).map { case (_, g) => g.minBy(_._1) }.toSeq
      .map { case (id, text) => (id, shingles(text)) }
    def sig(sh: Set[Long]): IndexedSeq[Long] =
      (0 until 32).map { j =>
        val seed = DupGraphSpec.mix64(j + 0x5851f42d4c957f2dL)
        sh.map(h => DupGraphSpec.mix64(h ^ seed)).min
      }
    reps.map { case (id, sh) => (id, sh, sig(sh)) }
  }

  /** The x03 chain replayed in plain Scala over the exact-collapsed reps —
    * 32-hash MinHash, 8 bands of 4, candidates = pairs sharing a band SLICE
    * (the engine band-joins on xxhash64 of the slice; slices collide iff
    * equal up to a ~2^-64 hash collision), then the integer Jaccard
    * admission and ppm weight on the candidate set. Output (a, b, w_ppm)
    * with a < b. */
  private def replayPairs(dir: String): Seq[(Long, Long, Long)] = {
    val sigs = replaySigs(dir)
    for {
      (a, sa, ga) <- sigs
      (b, sb, gb) <- sigs
      if a < b
      if (0 until 8).exists(bd => ga.slice(bd * 4, bd * 4 + 4) == gb.slice(bd * 4, bd * 4 + 4))
      inter = (sa intersect sb).size.toLong
      uni = sa.size.toLong + sb.size.toLong - inter
      if inter * 2 >= uni && uni > 0
    } yield (a, b, inter * 1000000L / uni)
  }

  /** TextHashes.shingleData semantics replayed in plain Scala (n = 3,
    * trailing sub-n shingle kept) — the same replay TextHashesSpec pins. */
  private def shingles(text: String): Set[Long] = {
    def tokenHash(t: String): Long = {
      var h = 0xcbf29ce484222325L
      t.foreach { c => h = (h ^ c) * 0x100000001b3L }
      DupGraphSpec.mix64(h)
    }
    val th = text.split(" ", -1).map(tokenHash)
    val m = math.max(th.length - 2, 1)
    (0 until m).map { k =>
      var h = th(k)
      var j = 1
      while (j < 3 && k + j < th.length) {
        h = DupGraphSpec.mix64(h ^ (th(k + j) + 0x9e3779b97f4a7c15L * j)); j += 1
      }
      h
    }.toSet
  }
}

object DupGraphSpec {
  /** splitmix64 finalizer — TextHashes.mix64 replayed. */
  def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }
}
