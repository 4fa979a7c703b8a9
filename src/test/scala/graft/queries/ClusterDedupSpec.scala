package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Gates for the hierarchical cluster dedup (x26): the MinHashUnion
  * signature identity, connected-component transitivity, and end-to-end
  * cluster accounting on the real documents table. */
class ClusterDedupSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("element-wise sig min ≡ signature of the unioned shingle sets (exact)") {
    // the algebraic property the cluster signatures rely on, checked on
    // every verified near-dup pair of the real corpus: no approximation
    val sigs = TextQueries.minhashSignatures(spark, sf).localCheckpoint(eager = false)
    val pairs = TextQueries.minhashPairs(sigs).select("doc_a", "doc_b")
    val joined = pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .withColumn("min_merged", zip_with(col("sig_a"), col("sig_b"), (a, b) => least(a, b)))
      .withColumn("union_sig", expr("graft_minhash(array_sort(array_union(sh_a, sh_b)), 32)"))
    joined.count() should be > 0L // 25 pairs at sf0.01
    joined.filter(col("min_merged") =!= col("union_sig")).count() shouldBe 0L
  }

  test("connectedReps labels every component by its min doc_id (transitive)") {
    import spark.implicits._
    // chain 1-2-3 must collapse to one cluster even though (1,3) never pairs
    val nodes = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val reps = TextQueries.connectedReps(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    reps shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L)
  }

  test("x26 accounts for every representative exactly once") {
    val sigs = TextQueries.minhashSignatures(spark, sf)
    val nReps = sigs.count()
    // registry: x26_dedup_clusters
    val out = TextQueries.dedupClusters.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.map(_._2).sum shouldBe nReps // every rep in exactly one cluster
    out.map(_._1).distinct.length shouldBe out.length // reps unique
    out.count(_._2 > 1) should be > 0 // the 25 near-dup pairs formed clusters
    // a cluster's rep is its own minimum: rep never appears in another row
    val repSet = out.map(_._1).toSet
    repSet.size shouldBe out.length
  }

  test("x55 leakage-safe split: no duplicate cluster straddles splits; x31 would leak") {
    // registry: x55_split_leakage_safe
    val out = TextQueries.splitLeakageSafe.run(spark, sf)
      .select("doc_id", "rep", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    out.map(_._1).distinct.length shouldBe out.length // one row per doc
    // the property the query exists for: every cluster in exactly one split
    out.groupBy(_._2).values.foreach(c => c.map(_._3).distinct.length shouldBe 1)
    out.map(_._3).toSet shouldBe Set("train", "val", "test")
    // ...and the per-doc x31 assignment demonstrably leaks on this corpus:
    // at least one multi-doc cluster gets different doc-keyed splits
    def docSplit(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (h.head <= 'b') "train" else if (h.head <= 'd') "val" else "test"
    }
    val leaky = out.groupBy(_._2).values
      .count(c => c.map(d => docSplit(d._1)).distinct.length > 1)
    leaky should be > 0
  }

  test("x58 dup-source matrix agrees with the x55 cluster chain; non-vacuous") {
    // recompute the matrix independently from x55's (doc_id, rep) chain
    // joined to the raw source column, and require the shipped corpus to
    // actually exercise it (near-dup mutations cross sources here)
    val chain = TextQueries.splitLeakageSafe.run(spark, sf)
      .select("doc_id", "rep").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val src = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val bySrcs = chain.toSeq.groupBy(_._2)
      .view.mapValues(_.map(d => src(d._1)).toSet).toMap
    val expected = bySrcs.values.toSeq
      .flatMap(ss => ss.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // registry: x58_dup_source_matrix
    val got = TextQueries.dupSourceMatrix.run(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    got shouldBe expected
    got should not be empty // vacuous-matrix guard: dups DO cross sources
  }

  test("x60 substring dup stats ≡ driver-side STRING-window recomputation (all docs)") {
    // registry: x60_substring_dup
    val out = TextQueries.substringDup.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.length shouldBe 500 // one row per doc, nothing dropped by the joins
    // independent oracle: the same window semantics on raw STRINGS (no
    // hashing at all) computed in local Scala — a 64-bit collision in the
    // engine's window hash would fail this loudly
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val winsByDoc: Map[Long, Set[String]] = texts.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val m = math.max(toks.length - 7, 1)
      id -> (0 until m).map(k => toks.slice(k, math.min(k + 8, toks.length)).mkString(" ")).toSet
    }.toMap
    val holders = winsByDoc.toSeq.flatMap { case (id, ws) => ws.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    out.foreach { case (id, nWin, dupWin, frac) =>
      val ws = winsByDoc(id)
      nWin shouldBe ws.size.toLong
      dupWin shouldBe ws.count(w => holders(w) >= 2).toLong
      frac shouldBe dupWin.toDouble / nWin // raw IEEE quotient (x62 lesson)
    }
    // the stat discriminates on the shipped corpus, not saturates: fully
    // duplicated docs, PARTIAL overlaps (what cluster dedup can't see),
    // and a clean majority all present
    out.count(_._4 == 1.0) should be > 0
    out.count { case (_, _, _, f) => f > 0.0 && f < 1.0 } should be > 0
    out.count(_._4 == 0.0) should be > 300
  }

  test("x61 substring cut ≡ driver-side STRING-window recomputation (all docs)") {
    // registry: x61_substring_cut
    val out = TextQueries.substringCut.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    out.length shouldBe 500
    // independent oracle on raw STRINGS: windows → min-doc owner → cut
    // spans → ordered reassembly, no hashing anywhere
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val winLists: Map[Long, Seq[(Int, String)]] = texts.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val m = math.max(toks.length - 7, 1)
      id -> (0 until m).map(k => k -> toks.slice(k, math.min(k + 8, toks.length)).mkString(" "))
    }.toMap
    val owner: Map[String, Long] = winLists.toSeq
      .flatMap { case (id, ws) => ws.map { case (_, w) => w -> id } }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = texts.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val cutPos = winLists(id).collect {
        case (k, w) if owner(w) < id => k until math.min(k + 8, toks.length)
      }.flatten.toSet
      val keptToks = toks.indices.filterNot(cutPos).map(toks)
      (id, toks.length.toLong, cutPos.size.toLong, keptToks.mkString(" "))
    }.sortBy(_._1)
    out.toSeq shouldBe expected.toSeq
    // non-vacuity: full cuts (non-owner of a complete dup), partial cuts,
    // and an untouched majority all present on the shipped corpus
    out.count { case (_, n, c, t) => c == n && t.isEmpty } should be > 0
    out.count { case (_, n, c, _) => c > 0 && c < n } should be > 0
    out.count(_._3 == 0L) should be > 300
  }

  test("x136 halo: a near-dup of a contaminated doc is purged even with its gram mutated away") {
    // registry: x136_contamination_halo
    import spark.implicits._
    def md5hex1(id: Long): Char = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    // pick ids on the required sides of the x31 md5 split
    val trainIds = (1L to 500L).filter(md5hex1(_) <= 'd')
    val testIds = (1L to 500L).filter(md5hex1(_) > 'd')
    val Seq(idA, idB, idC, idD, idE) = trainIds.take(5).toSeq
    val idT = testIds.head
    // shared 60-token prefix → shingle Jaccard ≈ 0.85 between A and B:
    // a verified near-dup pair. A carries the benchmark gram G; B carries
    // a mutated gram H — B shares NO 5-gram with the benchmark.
    val prefix = (1 to 60).map(i => s"p$i").mkString(" ")
    val gramG = "g1 g2 g3 g4 g5"
    val gramH = "h1 h2 h3 h4 h5"
    val dd = Seq(
      (idA, s"$prefix $gramG"), // direct: contains G
      (idB, s"$prefix $gramH"), // halo: near-dup of A, gram mutated
      (idD, s"$prefix $gramG"), // exact dup of A → direct on its own grams
      (idE, s"$prefix $gramH"), // exact dup of B → halo via the e_rep chain
      (idC, (1 to 40).map(i => s"z$i").mkString(" ")), // clean train doc
      (idT, gramG)              // the benchmark doc
    ).toDF("doc_id", "text")
    val out = TextQueries.contaminationHaloOf(dd)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
    val rep = Seq(idA, idB, idD, idE).min // one cluster labeled by its min id
    out.keySet shouldBe Set(idA, idB, idD, idE) // clean + test docs absent
    out(idA) shouldBe ((rep, "direct", 1L, 1L))
    out(idD) shouldBe ((rep, "direct", 1L, 1L))
    out(idB) shouldBe ((rep, "halo", 0L, 0L))
    out(idE) shouldBe ((rep, "halo", 0L, 0L))
  }
}
