package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Durable index artifacts: the IVF centroids and the MinHash signature
  * table must round-trip through parquet so later sessions probe without
  * re-paying the build. The no-retrain guarantees are asserted the hard
  * way: the probe calls get a BOGUS corpus directory (or none at all) — if
  * they touched the corpus instead of the artifact, they would throw. */
class IndexDurabilitySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("IVF centroids round-trip exactly and probe without retraining") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString + "/ivf"
    val trained = SimilarityQueries.ivfCentroids(spark, sf)
    SimilarityQueries.saveIvfIndex(spark, sf, dir)
    SimilarityQueries.clearIvfCache() // simulate a fresh session (memo gone)
    // artifact exists → the durable path must load it and never read the
    // corpus: a nonexistent data dir proves no retraining happened
    val loaded = SimilarityQueries.ivfCentroidsDurable(
      spark, "/nonexistent/corpus/dir", dir)
    loaded shouldBe trained // exact doubles — same index, not a re-train
  }

  test("ivfCentroidsDurable trains+writes on first call, loads thereafter") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index2").toString + "/ivf"
    val first = SimilarityQueries.ivfCentroidsDurable(spark, sf, dir)
    SimilarityQueries.clearIvfCache()
    val second = SimilarityQueries.ivfCentroidsDurable(
      spark, "/nonexistent/corpus/dir", dir) // must come from the artifact
    second shouldBe first
    first.length shouldBe 16
  }

  test("MinHash signature table round-trips; probe matches the full query") {
    val dir = java.nio.file.Files.createTempDirectory("mh-index").toString + "/sigs"
    TextQueries.saveMinhashIndex(spark, sf, dir)
    // probe-only path: reads ONLY the artifact (no corpus dir argument)
    val fromIndex = TextQueries.dedupMinhashFromIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val direct = TextQueries.dedupMinhash.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    fromIndex should not be empty // 25 pairs at sf0.01
    fromIndex shouldBe direct
  }

  test("appendToMinhashIndex: the next probe finds docs accepted by the last one") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("mh-append").toString + "/sigs"
    TextQueries.saveMinhashIndex(spark, sf, dir)
    val before = spark.read.parquet(dir).count()

    // an accepted batch: one novel doc plus one near-dup mutation of it
    // (novel vs the CORPUS — they only match each other)
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val mutated = ("zzz1 zzz2 " + (3 to 40).map(i => s"tok$i").mkString(" "))
    val accepted = Seq((900001L, base)).toDF("doc_id", "text")
    TextQueries.appendToMinhashIndex(accepted, dir)

    // the grown index: original rows untouched, new row present
    val after = spark.read.parquet(dir)
    after.count() shouldBe before + 1
    after.filter(col("doc_id") === 900001L).count() shouldBe 1L

    // the NEXT batch's probe sees the appended doc as corpus
    val hits = TextQueries.nearDupProbe(
      Seq((900002L, mutated)).toDF("doc_id", "text"), after)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    hits should contain((900002L, 900001L))
    // and the appended signature equals a fresh sketch of the same text
    // (one shared definition — no drift between build and append paths)
    val fresh = accepted
      .selectExpr("graft_minhash(graft_shingles(text, 3), 32) AS sig")
      .head().getSeq[Long](0)
    after.filter(col("doc_id") === 900001L)
      .select("sig").head().getSeq[Long](0) shouldBe fresh
  }

  test("PQ codes artifact round-trips; shortlist-from-index matches, no corpus access") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("pq-index").toString + "/codes"
    SimilarityQueries.savePqIndex(spark, sf, dir)
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    // the from-index probe takes NO corpus directory — only the artifact
    // path and the query frame; equality proves artifact ≡ inline encoding
    val fromIndex = rows(SimilarityQueries.pqShortlistFromIndex(spark, queries, dir))
    val inline = rows(SimilarityQueries.pqShortlistOf(
      SimilarityQueries.pqCorpusCodes(emb), queries))
    fromIndex shouldBe inline
    fromIndex.length shouldBe 10 * 25 // every query fills its shortlist
    // artifact shape: the compressed index really is 8 small codes per row
    val codes = spark.read.parquet(dir)
    codes.columns.sorted shouldBe Array("cell", "codes", "vec_id")
    codes.collect().foreach { r =>
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      cs.length shouldBe PqPinned.nSub
      cs.foreach { c => c should (be >= 0 and be < PqPinned.nCodes) }
    }
  }

  test("appendToPqIndex: the next probe sees appended vectors; codes ≡ fresh encode") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("pq-append").toString + "/codes"
    val emb = graft.Tables.embeddings(spark, sf)
    // initial index: all but the last 20 vectors; then append those 20
    val maxId = emb.agg(org.apache.spark.sql.functions.max("vec_id")).head().getLong(0)
    val base = emb.filter(col("vec_id") <= maxId - 20)
    val batch = emb.filter(col("vec_id") > maxId - 20)
    graft.sources.Sinks.parquet(SimilarityQueries.pqCorpusCodes(base), dir)
    SimilarityQueries.appendToPqIndex(batch, dir)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    // append ≡ full build: the probe over the appended artifact matches a
    // probe over a from-scratch encode of the WHOLE corpus
    rows(SimilarityQueries.pqShortlistFromIndex(spark, queries, dir)) shouldBe
      rows(SimilarityQueries.pqShortlistOf(SimilarityQueries.pqCorpusCodes(emb), queries))
    // and the appended rows' codes are bit-identical to a fresh encode
    val appended = spark.read.parquet(dir).filter(col("vec_id") > maxId - 20)
    val fresh = SimilarityQueries.pqCorpusCodes(batch)
    appended.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getSeq[Int](2))).sortBy(_._1).toSeq shouldBe
      fresh.collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2))).sortBy(_._1).toSeq
  }

  test("bucketed band index: probe matches, corpus side scans bucket-aligned") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("mh-band").toString + "/sigs"
    TextQueries.saveMinhashIndex(spark, sf, dir)
    val sigs = spark.read.parquet(dir)
    TextQueries.saveBandIndex(sigs, "band_idx", buckets = 8)
    // incoming batch: two corpus payloads under fresh ids + one novel doc
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").select("text").limit(2).collect().map(_.getString(0))
    import spark.implicits._
    val incoming = Seq(
      (200001L, texts(0)), (200002L, texts(1)),
      (200003L, "entirely novel zz qq payload")).toDF("doc_id", "text")
    val viaBands = TextQueries
      .nearDupProbeWithBands(incoming, spark.table("band_idx"), sigs)
    val direct = TextQueries.nearDupProbe(incoming, sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    viaBands.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted shouldBe direct
    direct should not be empty
    // the artifact's clustering is real: the corpus-side scan reads as a
    // bucketed source (its HashPartitioning feeds the candidate join
    // without a corpus-side exchange)
    val plan = viaBands.queryExecution.executedPlan.toString
    plan should include("Bucketed: true")
  }

  test("refreshAnnIndex: the canary REFUSES a degraded candidate; a good one swaps atomically with the pin re-emitted") {
    import spark.implicits._
    // Planted 16-cluster fixture with hand-provable recall: cluster i sits
    // at 10·e_i (axes 0..15); member m rides noise 1·e_{16+(m mod 16)} and
    // a tiny distinct ε on dim 63. vec_id = i + 16·m, so queries (id < 10)
    // are member 0 of clusters 0..9 and each query's exact top-5 is five
    // of its own cluster-mates (intra cos ≈ 0.99, cross ≈ 0).
    val dim = 64
    val rows = for (i <- 0 until 16; m <- 0 until 24) yield {
      val v = Array.fill(dim)(0.0f)
      v(i) = 10.0f
      v(16 + (m % 16)) = 1.0f
      v(63) = (v(63) + 0.001f * m).toFloat
      (i + 16L * m, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    // GOOD geometry: one centroid per planted cluster → every query's
    // neighbors share its cell → recall 10⁶ at nprobe 1 (so the pinned
    // operating point IS nprobe 1, floor 900000)
    def oneHot(axis: Int, scale: Double): Seq[Double] =
      Seq.tabulate(dim)(k => if (k == axis) scale else 0.0)
    val good = Seq.tabulate(16)(i => oneHot(i, 10.0))
    val base = java.nio.file.Files.createTempDirectory("ann-refresh").toString
    val indexPath = s"$base/ivf"
    val pinPath = s"$base/pin"
    graft.sources.Sinks.parquet(
      good.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "centroid"), indexPath)
    graft.sources.Sinks.parquet(
      SimilarityQueries.operatingPointOf(SimilarityQueries.recallSweepOf(emb, good)),
      pinPath)
    val pinned = spark.read.parquet(pinPath).collect().head
    pinned.getAs[Int]("nprobe") shouldBe 1
    pinned.getAs[Long]("recall_ppm") shouldBe 1000000L

    // DEGRADED candidate: centroids live on the NOISE axes (16..31), so
    // cluster-mates scatter PERFECTLY evenly across all 16 cells (member m
    // lands in cell m mod 16 by construction) — recall at the pinned
    // nprobe=1 is 0: the canary must refuse and touch nothing
    val degraded = Seq.tabulate(16)(j => oneHot(16 + j, 10.0))
    val before = spark.read.parquet(indexPath).orderBy("cell").collect()
      .map(_.getSeq[Double](1))
    val err = intercept[IllegalStateException] {
      SimilarityQueries.refreshAnnIndex(emb, degraded, indexPath, pinPath)
    }
    err.getMessage should include("REFUSED")
    err.getMessage should include("nprobe=1")
    spark.read.parquet(indexPath).orderBy("cell").collect()
      .map(_.getSeq[Double](1)) shouldBe before // live index untouched
    spark.read.parquet(pinPath).collect().head
      .getAs[Long]("recall_ppm") shouldBe 1000000L // pin untouched
    // refusal precedes any write: no staging directory is ever created
    new java.io.File(indexPath + ".staging").exists() shouldBe false

    // GOOD candidate (a retrain that shifted slightly but kept geometry):
    // clears the floor → the artifact now holds the CANDIDATE centroids
    // and the pin is re-emitted from the candidate's own sweep
    val candidate = good.map(c => c.updated(62, 0.01))
    val newPin = SimilarityQueries.refreshAnnIndex(emb, candidate, indexPath, pinPath)
    newPin.getAs[Int]("nprobe") shouldBe 1
    newPin.getAs[Long]("recall_ppm") shouldBe 1000000L
    val swapped = spark.read.parquet(indexPath).orderBy("cell").collect()
      .map(_.getSeq[Double](1).toSeq)
    swapped.toSeq shouldBe candidate
    spark.read.parquet(pinPath).collect().head
      .getAs[Long]("max_recall_ppm") shouldBe 1000000L
  }
}
