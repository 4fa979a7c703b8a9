package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.queries.TextQueries

/** Streaming incremental near-dup ingest: new documents arriving on a
  * stream are probed against the DURABLE MinHash signature artifact —
  * stream-static join, no re-sketching of the corpus — with results
  * identical to the batch probe on the same rows. */
class DocStreamSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("streaming near-dup probe vs durable index ≡ batch probe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mh-probe").toString + "/sigs"
    TextQueries.saveMinhashIndex(spark, sf, dir)
    val index = spark.read.parquet(dir)

    // incoming batch: two byte-identical copies of corpus docs (jaccard 1.0
    // hits guaranteed) + one novel doc that matches nothing
    val corpusTexts = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").select("text").limit(2).collect().map(_.getString(0))
    val incoming = Seq(
      (100001L, corpusTexts(0)),
      (100002L, corpusTexts(1)),
      (100003L, "zzz qqq completely novel payload xyzzy plugh"))

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF.toDF("doc_id", "text")
    val q = TextQueries.nearDupProbe(docs, index)
      .writeStream.format("memory").queryName("ndprobe").outputMode("append").start()
    val streamed = try {
      input.addData(incoming.take(2))
      q.processAllAvailable()
      input.addData(incoming.drop(2)) // second trigger
      q.processAllAvailable()
      spark.table("ndprobe").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    } finally q.stop()

    val batch = TextQueries.nearDupProbe(
      incoming.toDF("doc_id", "text"), index).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted

    streamed shouldBe batch
    // the two copies must self-report their corpus source at jaccard 1.0
    streamed.filter(_._3 == 1.0).map(_._1).distinct.sorted shouldBe Seq(100001L, 100002L)
    // the novel doc matches nothing
    streamed.map(_._1) should not contain 100003L
  }

  test("streaming bloom membership ≡ batch x70 on the same rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_distinct, array_join, array_sort, col, split}
    // static side: the x70 corpus (doc_id % 10 <> 0) keyed on the BoW key
    val mBits = 1 << 18
    def keyed(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      array_join(array_sort(array_distinct(split(col("text"), " "))), " ").as("bk"))
    val corpus = keyed(spark.read.parquet(s"$sf/documents.parquet"))
      .filter(col("doc_id") % 10 =!= 0).select("bk")
    val corpusCounts = corpus.groupBy("bk").count()
    val bits = TextQueries.bloomBuild(corpus, "bk", mBits)
      .head().getSeq[Long](0).toArray

    // incoming: one BoW-duplicate of a corpus doc (token-reorder), one
    // byte-copy, one novel doc
    val corpusTexts = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 =!= 0)
      .orderBy("doc_id").select("text").limit(2).collect().map(_.getString(0))
    val reordered = corpusTexts(0).split(" ").reverse.mkString(" ")
    val incoming = Seq(
      (200001L, reordered),
      (200002L, corpusTexts(1)),
      (200003L, "zzz qqq completely novel payload xyzzy plugh"))

    val input = MemoryStream[(Long, String)]
    val q = EventStream.bloomMembership(
      keyed(input.toDF.toDF("doc_id", "text")), "bk", bits, corpusCounts, mBits)
      .writeStream.format("memory").queryName("bloomprobe").outputMode("append").start()
    val streamed = try {
      input.addData(incoming.take(1))
      q.processAllAvailable()
      input.addData(incoming.drop(1)) // second trigger
      q.processAllAvailable()
      spark.table("bloomprobe").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    } finally q.stop()

    val batch = TextQueries.bloomMembership(
      keyed(incoming.toDF("doc_id", "text")), "bk",
      TextQueries.bloomBuild(corpus, "bk", mBits), corpus, mBits)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.coalesce(col("n_matches"),
          org.apache.spark.sql.functions.lit(0L)).as("n_matches"),
        col("n_matches").isNotNull.cast("int").as("is_dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted

    streamed shouldBe batch
    // both duplicate forms hit; the novel doc does not
    streamed.filter(_._3 == 1).map(_._1) shouldBe Array(200001L, 200002L)
    streamed.filter(_._1 == 200003L).head._3 shouldBe 0
  }

  test("streaming heavy hitters: per-window top-k tokens exact under capacity (x42 twin)") {
    import spark.implicits._
    def at(minute: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
    val input = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val docs = input.toDF.toDF("doc_id", "ts", "lang", "text")
    val q = EventStream.topkTokens(docs, m = 16, k = 3)
      .writeStream.format("memory").queryName("tk42").outputMode("append").start()
    try {
      input.addData(
        (1L, at(5), "en", "a a a b b c"),
        (2L, at(10), "en", "b b a d"),
        (3L, at(15), "de", "x y x"))
      q.processAllAvailable()
      // second micro-batch merges into the SAME window's persisted sketch
      input.addData((4L, at(20), "en", "c c c c"))
      q.processAllAvailable()
      // far-future sentinel advances the watermark past the window end so
      // append mode emits the final rankings
      input.addData((5L, java.sql.Timestamp.valueOf("2026-01-02 00:00:00"), "zz", "s"))
      q.processAllAvailable()
      val rows = spark.table("tk42").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getInt(4)))
        .filter(_._1 != "zz").toSet
      // exact merged counts (vocab 4 < m): en a=4 b=4 c=5 d=1; de x=2 y=1
      // ranking = cnt desc, token asc — the x42 oracle's rule
      rows shouldBe Set(
        ("en", "c", 5L, 1), ("en", "a", 4L, 2), ("en", "b", 4L, 3),
        ("de", "x", 2L, 1), ("de", "y", 1L, 2))
    } finally q.stop()
  }

  test("streaming BPE encode vs trained vocab artifact ≡ batch x103 transform (stateless twin)") {
    import spark.implicits._
    // the trained-offline artifact posture: merges learned from the batch
    // corpus, applied online to arriving docs (incl. docs the trainer
    // never saw)
    val merges = TextQueries.bpeMergeTable(spark, sf).cache()
    merges.count()
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").select("doc_id", "text").limit(3).collect()
    val incoming: Seq[(Long, String)] =
      corpus.map(r => (r.getLong(0) + 300000L, r.getString(1))).toSeq ++ Seq(
        (300101L, "novel words the trainer never saw"),
        (300102L, "   "), // whitespace-only: zero tokens, filtered out
        (300103L, "erer aaaa abab"))

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF.toDF("doc_id", "text")
    val q = DocStream.encodeTokens(docs, merges)
      .writeStream.format("memory").queryName("bpestream").outputMode("append").start()
    val streamed = try {
      input.addData(incoming.take(4))
      q.processAllAvailable()
      input.addData(incoming.drop(4)) // second micro-batch, same artifact
      q.processAllAvailable()
      spark.table("bpestream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    } finally q.stop()

    val batch = TextQueries.bpeEncodeDocs(incoming.toDF("doc_id", "text"), merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    streamed shouldBe batch
    // corpus copies tokenize exactly like their originals did in batch x103
    streamed.length shouldBe incoming.length - 1 // whitespace-only doc dropped
    streamed.map(_._1) should not contain 300102L
  }

  test("streaming PII scan+redact ≡ batch x106 transform on the same rows (stateless twin)") {
    import spark.implicits._
    val incoming: Seq[(Long, String)] = Seq(
      (1L, "contact alice@example.com or call 415-555-0199 now"),
      (2L, "server at 10.0.42.1 responded"),
      (3L, "no pii here at all"),
      (4L, "two mails a@b.io c@d.org and ip 192.168.0.1 and 650-555-1234"),
      (5L, "")) // empty text: zero counts, md5 of empty string

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF.toDF("doc_id", "text")
    val q = DocStream.piiRedact(docs)
      .writeStream.format("memory").queryName("piistream").outputMode("append").start()
    val streamed = try {
      input.addData(incoming.take(3))
      q.processAllAvailable()
      input.addData(incoming.drop(3))
      q.processAllAvailable()
      spark.table("piistream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getLong(5))).sorted
    } finally q.stop()

    val batch = TextQueries.piiScanRedact(
      incoming.toDF("doc_id", "planted")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).sorted
    streamed shouldBe batch
    // spot-check the redaction semantics, not just parity
    streamed.find(_._1 == 1L).get match { case (_, e, p, ip, _, _) =>
      (e, p, ip) shouldBe ((1L, 1L, 0L))
    }
    streamed.find(_._1 == 4L).get match { case (_, e, p, ip, _, _) =>
      (e, p, ip) shouldBe ((2L, 1L, 1L))
    }
    streamed.find(_._1 == 3L).get._5 shouldBe
      org.apache.commons.codec.digest.DigestUtils.md5Hex("no pii here at all")
  }

  test("streaming decon admission ≡ the x35 join form on the same rows (stateless twin)") {
    import spark.implicits._
    // benchmark: two docs → distinct eval grams incl. overlapping windows
    val evalDocs = Seq(
      (900L, "g1 g2 g3 g4 g5 g6"),
      (901L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text")
    val ev = TextQueries.evalGramTable(evalDocs).cache()
    ev.count()
    val incoming: Seq[(Long, String)] = Seq(
      (1L, "x g1 g2 g3 g4 g5 g6 y"), // two eval windows inside → 2 hits
      (2L, "a perfectly clean document with many ordinary words inside"),
      (3L, "too short"), // <5 tokens: no grams, must still be ADMITTED
      (4L, "q1 q2 q3 q4 q5"), // verbatim benchmark doc → 1 hit
      (5L, "g1 g2 g3 g4 g5 g1 g2 g3 g4 g5")) // repeated gram counts ONCE (distinct)

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF.toDF("doc_id", "text")
    val q = DocStream.deconAdmission(docs, ev)
      .writeStream.format("memory").queryName("deconstream").outputMode("append").start()
    val streamed = try {
      input.addData(incoming.take(3))
      q.processAllAvailable()
      input.addData(incoming.drop(3)) // second micro-batch, same artifact
      q.processAllAvailable()
      spark.table("deconstream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    } finally q.stop()

    // the INDEPENDENT x35 join form on the same rows — a different gram
    // enumeration spelling (explode+distinct+join) than the probe's
    // row-local HOF, so the two can't share a bug
    val evg = TextQueries.fiveGramsOf(evalDocs).select("g").distinct()
    val hits = TextQueries.fiveGramsOf(incoming.toDF("doc_id", "text"))
      .join(evg, "g").groupBy("doc_id").count()
    val batch = incoming.toDF("doc_id", "text").select("doc_id")
      .join(hits, Seq("doc_id"), "left").na.fill(0L, Seq("count"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(1) == 0L)).sorted
    streamed shouldBe batch
    // the semantics, not just parity
    val byId = streamed.map(t => t._1 -> ((t._2, t._3))).toMap
    byId(1L) shouldBe ((2L, false))
    byId(2L) shouldBe ((0L, true))
    byId(3L) shouldBe ((0L, true)) // sub-gram-width doc admitted, not crashed
    byId(4L) shouldBe ((1L, false))
    byId(5L) shouldBe ((1L, false)) // distinct grams: the repeat is one hit
  }

  test("streaming quality census vs pinned LM+thresholds (x135 live twin); replay idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("qcensus").toString
    val out = s"$base/census"
    // the pinned reference: model + tertile thresholds trained on the
    // batch corpus (the CCNet posture — the stream never retrains)
    val ref = graft.Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val model = TextQueries.lmModelOf(ref).cache(); model.count()
    val th = TextQueries.lmThresholdsOf(ref).cache(); th.count()
    val langs = th.collect().map(_.getString(0)).toSet

    // the artifact path ≡ the inline oracle-checked path on the corpus
    // itself: scoring the training corpus against its OWN model must
    // reproduce x62's integer scores exactly
    val fromArtifact = TextQueries.scoreAgainstLmModel(ref, model).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_ppm")).toMap
    val inline = TextQueries.lmScoreOf(ref.select("doc_id", "text")).collect()
      .map { r =>
        val n = r.getAs[Long]("n_trans")
        r.getAs[Long]("doc_id") -> math.round(r.getAs[Double]("lm_score") * n * 1e6) / n
      }.toMap
    fromArtifact shouldBe inline

    // incoming stream: corpus-like docs (known langs, shifted ids), a doc
    // of pure OOV transitions (scores 0 → tail), a lang the reference
    // never saw (must be DROPPED, not crash)
    val corpusDocs = ref.orderBy("doc_id").limit(4).collect()
      .map(r => (r.getLong(0) + 700000L, r.getString(1), r.getString(2))).toSeq
    val lang0 = langs.head
    val incoming = corpusDocs ++ Seq(
      (700101L, lang0, "zzq wwq vvq uuq ttq ssq"), // all-OOV → score 0 → tail
      (700102L, "xx_unseen", "some text in an unknown language here"))
    val input = MemoryStream[(Long, String, String)]
    val q = DocStream.qualityCensus(
      input.toDF.toDF("doc_id", "lang", "text"), model, th, out, s"$base/ckpt")
    try {
      input.addData(incoming.take(3)); q.processAllAvailable()
      input.addData(incoming.drop(3)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue(), r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

    // independent driver replay: score each doc in plain Scala against the
    // COLLECTED model map (OOV transition → 0), bucket vs the collected
    // thresholds, count per (epoch, lang, bucket)
    val mMap = model.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tMap = th.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def census(epoch: Long, docs0: Seq[(Long, String, String)]) =
      docs0.flatMap { case (_, lang, text) =>
        val w = text.split(" ")
        if (w.length < 2 || !tMap.contains(lang)) None
        else {
          val fs = w.sliding(2).map(p => mMap.getOrElse((p(0), p(1)), 0L)).toSeq
          val s0 = fs.sum / fs.size
          val (t1, t2) = tMap(lang)
          Some((lang, if (s0 <= t1) "tail" else if (s0 <= t2) "middle" else "head"))
        }
      }.groupBy(identity).map { case ((l, b), xs) => (epoch, l, b, xs.size.toLong) }.toSet
    val expected = census(0L, incoming.take(3)) ++ census(1L, incoming.drop(3))
    got shouldBe expected
    // the engineered rows: the OOV doc landed in tail; the unseen lang is absent
    got.exists(r => r._1 == 1L && r._3 == "tail") shouldBe true
    got.map(_._2) should not contain "xx_unseen"

    // replay: re-running epoch 1's body through the factored batch path
    // overwrites ONLY its own partition with identical rows
    graft.streaming.EventStream.writeEpoch(
      graft.streaming.DocStream.qualityCensusBatch(
        incoming.drop(3).toDF("doc_id", "lang", "text"), model, th), 1L, out)
    spark.read.parquet(out).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue(), r.getString(0), r.getString(1), r.getLong(2)))
      .toSet shouldBe expected
  }

  test("streaming datasheet state-fold ≡ batch mergeable stats on the union (x113 twin)") {
    import spark.implicits._
    // two micro-batches that exercise the merge arms: an existing source
    // growing, a source appearing only in batch 2, a NEW lang for an old
    // source, and min/max updates in both directions
    val b1 = Seq(
      (1L, "web", "en", "alpha beta gamma"),
      (2L, "web", "de", "delta"),
      (3L, "wiki", "en", "epsilon zeta eta theta iota"))
    val b2 = Seq(
      (4L, "web", "fr", "kappa lambda mu nu xi omicron pi rho sigma tau"),
      (5L, "books", "en", "mu"),
      (6L, "wiki", "en", "nu"))

    val input = MemoryStream[(Long, String, String, String)]
    val docs = input.toDF.toDF("doc_id", "source", "lang", "text")
    val q = DocStream.datasheetUpdates(docs)
      .writeStream.format("memory").queryName("dsstream").outputMode("update").start()
    val updates = try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      spark.table("dsstream").collect()
    } finally q.stop()

    // n_docs is monotone per source, so the max-n_docs row per source is
    // the state store's final fold
    val latest = updates.groupBy(_.getString(0)).map { case (src, rs) =>
      val r = rs.maxBy(_.getLong(1))
      src -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[String](4).toSet, r.getLong(5), r.getLong(6)))
    }
    val batch = TextQueries.datasheetStatsOf((b1 ++ b2).toDF("doc_id", "source", "lang", "text"))
      .collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[String](4).toSet, r.getLong(5), r.getLong(6)))
    }.toMap
    latest shouldBe batch
    // non-vacuity: 'web' and 'wiki' must have been UPDATED (two emissions),
    // i.e. the second batch really merged into first-batch state
    updates.count(_.getString(0) == "web") shouldBe 2
    updates.count(_.getString(0) == "wiki") shouldBe 2
    latest("web")._4 should contain("fr") // the lang-set grew across batches
  }

  test("streaming gate-ablation fold ≡ batch wide aggregate on the union (x151 twin); melt matches x151") {
    import spark.implicits._
    def good(p: String): String = "the a " + (1 to 38).map(i => f"$p${i}%04d").mkString(" ")
    // batch 1: web has a pass + an only-len fail; batch 2 adds an
    // only-stop fail to web (state must MERGE) and a new source
    val b1 = Seq(
      (1L, "web", good("w")),
      (2L, "web", "the a zz"),                          // fails len only
      (3L, "wiki", good("k")))
    val b2 = Seq(
      (4L, "web", (1 to 30).map(i => f"v${i}%04d").mkString(" ")), // fails stop only
      (5L, "books", good("b")))

    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF.toDF("doc_id", "source", "text")
    val q = DocStream.gateAblationUpdates(docs)
      .writeStream.format("memory").queryName("gastream").outputMode("update").start()
    val updates = try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      spark.table("gastream").collect()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row): Seq[Long] =
      (1 until r.length).map(i => r.getLong(i))
    // fail counts are monotone: the max-total row per source is the fold
    val latest = updates.groupBy(_.getString(0))
      .map { case (src, rs) => src -> rs.map(key).maxBy(_.sum) }
    // compare against the UNION batch run of the same wide aggregate
    val expected = DocStream.gateAblationUpdates(
      (b1 ++ b2).toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) -> key(r)).toMap
    latest shouldBe expected
    // non-vacuity: web emitted twice (real state merge), and its final
    // row carries BOTH failure classes folded across batches
    updates.count(_.getString(0) == "web") shouldBe 2
    // the melt of the folded state ≡ x151 on the union corpus
    val meltGot = TextQueries.gateAblationOf((b1 ++ b2).toDF("doc_id", "source", "text"))
      .orderBy("source", "rule").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    meltGot.filter(t => t._1 == "web" && t._2 == "len").head._3 shouldBe 1L
    meltGot.filter(t => t._1 == "web" && t._2 == "stop").head._3 shouldBe 1L
    meltGot.filter(t => t._1 == "books").map(_._3).sum shouldBe 0L
  }

  test("gate-ablation restart-from-checkpoint: the 16-sum state survives a stop and keeps folding") {
    import spark.implicits._
    // r18 verdict item 3: the fold ≡ batch test above proves the BATCH
    // semantics, but never stops a live gateAblationUpdates and restarts
    // it from its checkpoint — the lifecycle edge where the state store,
    // not the spec harness, must carry the widest (16-sum) state across
    // process generations. The memory sink cannot recover from a
    // checkpoint, so the stream lands in an epoch-ledger parquet via
    // foreachBatch (the admission tests' posture).
    def good(p: String): String = "the a " + (1 to 38).map(i => f"$p${i}%04d").mkString(" ")
    val b1 = Seq(
      (1L, "web", good("w")),
      (2L, "web", "the a zz"),                          // fails len only
      (3L, "wiki", good("k")))
    val b2 = Seq(
      (4L, "web", (1 to 30).map(i => f"v${i}%04d").mkString(" ")), // fails stop only
      (5L, "books", good("b")))
    val base = java.nio.file.Files.createTempDirectory("ga-restart").toString
    val out = s"$base/led"
    val input = MemoryStream[(Long, String, String)]
    def start() = DocStream.gateAblationUpdates(
        input.toDF.toDF("doc_id", "source", "text"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], e: Long) =>
        EventStream.writeEpoch(b.toDF(), e, out)
      }
      .start()
    val q1 = start()
    try { input.addData(b1); q1.processAllAvailable() } finally q1.stop()
    // restart from the SAME checkpoint in a fresh query: batch 2's web
    // emission must fold ON TOP of batch 1's restored state
    val q2 = start()
    try { input.addData(b2); q2.processAllAvailable() } finally q2.stop()
    val batchTwin = DocStream.gateAblationUpdates(
      (b1 ++ b2).toDF("doc_id", "source", "text"))
    val sumCols = batchTwin.columns.filterNot(_ == "source").toSeq
    val led = spark.read.parquet(out)
      .select(org.apache.spark.sql.functions.col("source") +:
        org.apache.spark.sql.functions.col("__epoch") +: sumCols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
    val latest = led.groupBy(_.getString(0)).map { case (src, rs) =>
      src -> rs.maxBy(_.getAs[Number]("__epoch").longValue)
    }
    // web re-emitted in epoch 1 (its state changed) and that row carries
    // BOTH failure classes — len from before the stop, stop from after:
    // a state store lost at restart would zero the len counts
    latest("web").getAs[Number]("__epoch").longValue shouldBe 1L
    val expected = batchTwin.collect()
      .map(r => r.getString(0) -> sumCols.map(c => r.getAs[Long](c))).toMap
    latest.view.mapValues(r => sumCols.map(c => r.getAs[Long](c))).toMap shouldBe expected
    // and the books row (first seen post-restart) landed too
    latest.keySet shouldBe Set("web", "wiki", "books")
  }

  test("streaming fertility fold ≡ batch per-lang stats on the union (x123 twin)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    // a fixed trained-vocab artifact (the x103 posture: vocab learned
    // offline, applied online): merge1 (a,l)→al, merge2 (al,p)→alp
    val merges = broadcast(Seq(Tuple1("a l al p")).toDF("merges"))
    val b1 = Seq(
      (1L, "web", "en", "alpha beta"),
      (2L, "web", "de", "lampe"),
      (3L, "wiki", "en", "pal pal alp"))
    val b2 = Seq(
      (4L, "web", "fr", "la la la palabra"), // lang appearing only in batch 2
      (5L, "books", "en", "alp"))            // existing lang growing

    val input = MemoryStream[(Long, String, String, String)]
    val docs = input.toDF.toDF("doc_id", "source", "lang", "text")
    val q = DocStream.fertilityUpdates(docs, merges)
      .writeStream.format("memory").queryName("fertstream").outputMode("update").start()
    val updates = try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      spark.table("fertstream").collect()
    } finally q.stop()

    // n_docs is monotone per lang → the max-n_docs emission is the final fold
    val latest = updates.groupBy(_.getString(0)).map { case (lang, rs) =>
      val r = rs.maxBy(_.getLong(1))
      lang -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }
    val batch = TextQueries.fertilityStatsOf(
      (b1 ++ b2).toDF("doc_id", "source", "lang", "text"), merges)
      .collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
    latest shouldBe batch
    // the second batch really merged into first-batch state, and the
    // derived floor-div fertility was re-derived on the refreshed sums
    updates.count(_.getString(0) == "en") shouldBe 2
    latest("en")._4 shouldBe latest("en")._3 * 1000L / latest("en")._2
  }

  test("nearDupAdmission: index + intra-batch flags, exactly-once hits, idempotent append under replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("mh-admit").toString
    val indexPath = s"$base/sigs"
    val hitsPath = s"$base/hits"

    // 30-token texts; a near-dup changes only the last token (J ≈ 0.8 over
    // 3-shingles — comfortably past the 0.5 verify); novel docs share no
    // vocabulary with anything else
    def text(prefix: String, last: String): String =
      (1 to 29).map(i => s"$prefix$i").mkString(" ") + " " + last
    val seed = Seq((1L, text("w", "alpha")), (2L, (1 to 30).map(i => s"q$i").mkString(" ")))
    graft.sources.Sinks.sortedParquet(
      TextQueries.minhashSignaturesOf(seed.toDF("doc_id", "text")), indexPath, Seq("doc_id"))

    val b1 = Seq(
      (10L, text("w", "beta")),       // near-dup of seeded doc 1
      (11L, text("n", "novel")),      // novel → admitted
      (12L, text("n", "zz")),         // INTRA-batch near-dup of 11
      (13L, text("n", "novel")))      // INTRA-batch EXACT dup of 11
    val b2 = Seq(
      (20L, text("n", "yy")),         // near-dup of the JUST-admitted 11
      (21L, (1 to 30).map(i => s"m$i").mkString(" "))) // novel

    val input = MemoryStream[(Long, String)]
    val q = DocStream.nearDupAdmission(
      input.toDF.toDF("doc_id", "text"), indexPath, hitsPath, s"$base/ckpt")
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val hits = spark.read.parquet(hitsPath).collect()
      .map(r => (r.getAs[Long]("__epoch"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("corpus_doc_id"), r.getAs[Double]("jaccard")))
    // epoch 0: the seeded near-dup + BOTH intra-batch collision surfaces
    // (12 near-dups the earlier 11; exact dup 13 attributes to its rep 11
    // at jaccard exactly 1.0); epoch 1: the cross-batch near-dup — provable
    // only because batch 1's admit really grew the index
    hits.map(h => (h._1, h._2, h._3)).toSet shouldBe
      Set((0L, 10L, 1L), (0L, 12L, 11L), (0L, 13L, 11L), (1L, 20L, 11L))
    hits.foreach(_._4 should be >= 0.5)
    hits.find(h => h._2 == 13L).get._4 shouldBe 1.0

    // the grown index holds exactly seed + the earliest of each clique —
    // admission NEVER seeds the index with a dup pair
    val grown = spark.read.parquet(indexPath).collect()
      .map(r => r.getAs[Long]("doc_id")).sorted
    grown shouldBe Array(1L, 2L, 11L, 21L)

    // REPLAY idempotence (foreachBatch is at-least-once and the append is
    // not transactional with the checkpoint): re-deliver batch 2 through a
    // fresh stream against the already-grown index — the shape of an epoch
    // replayed after its append committed but before its checkpoint did.
    // The index must converge (no duplicate signature rows), and the
    // replayed epoch must not flag docs against their own half-committed
    // signatures (21 is in the index; it must not self-flag).
    val input2 = MemoryStream[(Long, String)]
    val q2 = DocStream.nearDupAdmission(
      input2.toDF.toDF("doc_id", "text"), indexPath, s"$base/hits2", s"$base/ckpt2")
    try { input2.addData(b2); q2.processAllAvailable() } finally q2.stop()
    val replayed = spark.read.parquet(indexPath).collect()
      .map(r => r.getAs[Long]("doc_id")).sorted
    replayed shouldBe Array(1L, 2L, 11L, 21L) // byte-identical id set, no dup rows
    val replayHits = spark.read.parquet(s"$base/hits2").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("corpus_doc_id"))).toSet
    replayHits shouldBe Set((20L, 11L)) // same hits as the first attempt; no self-flag
  }

  test("quotaAdmission: x53 cut rule over the concatenated stream; ledger state; same-epoch replay converges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("quota-admit").toString
    val statePath = s"$base/state"
    val acceptedPath = s"$base/accepted"
    def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")
    val quotas = Seq(("a", 100L), ("b", 50L)).toDF("source", "quota_tokens")

    // epoch 0 — md5 order within source a is 1, 2, 3 (c4ca… < c81e…? no:
    // the test doesn't hand-assume; the driver-side replay below computes
    // the order itself). Source c has NO quota row → admits nothing.
    val b1 = Seq((1L, "a", doc(40)), (2L, "a", doc(40)), (3L, "a", doc(40)),
      (4L, "b", doc(30)), (5L, "c", doc(10)))
    // epoch 1 — a's quota is already overspent (crossing-doc overshoot),
    // so its new doc is cut; b still has room for both arrivals
    val b2 = Seq((6L, "a", doc(10)), (7L, "b", doc(15)), (8L, "b", doc(10)))

    val input = MemoryStream[(Long, String, String)]
    val q = DocStream.quotaAdmission(
      input.toDF.toDF("doc_id", "source", "text"), quotas,
      statePath, acceptedPath, s"$base/ckpt")
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // DRIVER-SIDE REPLAY of the cut rule on the concatenated stream: per
    // source, per epoch, docs in (md5, id) order, admitted while the
    // running total (across epochs) is under quota — crossing doc kept
    def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val quotaMap = Map("a" -> 100L, "b" -> 50L)
    val consumed = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long, Long)]
    Seq(0L -> b1, 1L -> b2).foreach { case (ep, batch) =>
      batch.groupBy(_._2).toSeq.foreach { case (src, docs0) =>
        quotaMap.get(src).foreach { quota =>
          docs0.sortBy(d => (md5hex(d._1), d._1)).foreach { case (id, _, text) =>
            val n = text.split("\\s+").length.toLong
            if (consumed(src) < quota) {
              expected += ((ep, id, src, n, consumed(src)))
              consumed(src) += n
            }
          }
        }
      }
    }
    def readAccepted() = spark.read.parquet(acceptedPath).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("offset_tokens"))).sortBy(t => (t._1, t._2)).toSeq
    readAccepted() shouldBe expected.sortBy(t => (t._1, t._2)).toSeq
    // the cut really bit both ways: a's epoch-1 doc rejected, c never admitted
    readAccepted().map(_._2) should not contain 6L
    readAccepted().map(_._3) should not contain "c"
    // the ledger holds the cumulative admitted mass per source
    def latestState() = spark.read.parquet(statePath).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[String]("source"),
        r.getAs[Long]("consumed_tokens")))
      .groupBy(_._2).view.mapValues(_.maxBy(_._1)._3).toMap
    latestState() shouldBe consumed.toMap
    // bounded state by construction: per epoch, at most one row per source
    spark.read.parquet(statePath).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[String]("source")))
      .groupBy(identity).values.foreach(_.length shouldBe 1)

    // SAME-EPOCH REPLAY (foreachBatch is at-least-once): re-deliver epoch 1
    // through the factored batch body — the prior-ledger read excludes the
    // replayed epoch's own half-committed rows, so both artifacts converge
    val before = (readAccepted(), latestState())
    DocStream.quotaAdmitBatch(
      b2.toDF("doc_id", "source", "text"), 1L, quotas, statePath, acceptedPath)
    (readAccepted(), latestState()) shouldBe before
  }

  test("composed admission (decon → near-dup → quota): rejected docs consume no quota; index = admitted corpus; redelivery converges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("admit-all").toString
    val indexPath = s"$base/sigs"
    val paths = Seq("decon", "hits", "state", "accepted").map(p => s"$base/$p")
    val Seq(deconPath, hitsPath, statePath, acceptedPath) = paths

    def t(prefix: String, last: String): String =
      (1 to 29).map(i => s"$prefix$i").mkString(" ") + " " + last
    def d40(prefix: String): String = (1 to 40).map(i => s"$prefix$i").mkString(" ")
    val caPrefix = (1 to 25).map(i => s"ca$i").mkString(" ")

    // pinned artifacts: benchmark grams + a seeded dup-free index
    val ev = TextQueries.evalGramTable(
      Seq((900L, "g1 g2 g3 g4 g5 g6")).toDF("doc_id", "text")).cache()
    ev.count()
    val seed = Seq((1L, t("w", "alpha")), (2L, (1 to 30).map(i => s"q$i").mkString(" ")))
    graft.sources.Sinks.sortedParquet(
      TextQueries.minhashSignaturesOf(seed.toDF("doc_id", "text")), indexPath, Seq("doc_id"))
    val quotas = Seq(("a", 100L), ("b", 25L)).toDF("source", "quota_tokens")

    // epoch 0 — every rejection class in source a, sized so the INTERACTION
    // is binding: if EITHER rejected 30-token doc consumed quota, the two
    // clean 40-token docs could not both fit under a's 100
    val b1 = Seq(
      (10L, "a", s"$caPrefix g1 g2 g3 g4 g5"), // benchmark gram inside → decon-rejected
      (11L, "a", t("w", "beta")),              // near-dup of INDEX doc 1 → dup-rejected
      (12L, "a", d40("ad")),                   // clean novel → admitted
      (13L, "a", d40("ae")),                   // clean novel → admitted
      (14L, "a", d40("ad")),                   // intra-batch EXACT dup of 12 → dup-rejected
      (15L, "b", t("bb", "one")),              // b: exactly one of {15,17} fits quota 25
      (17L, "b", t("bc", "two")),
      (16L, "c", t("cc", "solo")))             // no quota row → never admitted
    // epoch 1 — the index-membership pins: 20 near-dups a doc ADMITTED one
    // epoch earlier (flagged); 21 near-dups the DECON-REJECTED 10 (last two
    // tokens differ, no benchmark gram) — 10 never joined the corpus, so 21
    // is judged on its own merits and admitted; 22 dies at the quota (b spent)
    val b2 = Seq(
      (20L, "a", (1 to 39).map(i => s"ad$i").mkString(" ") + " zz"),
      (21L, "a", s"$caPrefix g1 g2 g3 h4 h5"),
      (22L, "b", t("bd", "late")))

    val input = MemoryStream[(Long, String, String)]
    val q = DocStream.admission(input.toDF.toDF("doc_id", "source", "text"),
      ev, quotas, indexPath, deconPath, hitsPath, statePath, acceptedPath, s"$base/ckpt")
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // decon log: exactly the contaminated doc rejected, per epoch
    val dec = spark.read.parquet(deconPath).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"),
        r.getAs[Boolean]("admitted")))
    dec.filter(!_._3).map(d => (d._1, d._2)).toSet shouldBe Set((0L, 10L))
    dec.map(_._2).toSet shouldBe (b1 ++ b2).map(_._1).toSet

    // near-dup log: the index hit, the intra-batch exact dup, and the
    // cross-epoch hit against the epoch-0 ADMITTED doc — and nothing else
    // (in particular nothing ever flagged against unadmitted 10/11/14/16/22)
    spark.read.parquet(hitsPath).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"),
        r.getAs[Long]("corpus_doc_id"))).toSet shouldBe
      Set((0L, 11L, 1L), (0L, 14L, 12L), (1L, 20L, 12L))

    // quota: driver-side replay of the x53 cut over the SURVIVOR stream
    def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val survivors = Map( // post-decon, post-dup, by construction above
      0L -> b1.filter(d => !Seq(10L, 11L, 14L).contains(d._1)),
      1L -> b2.filter(_._1 != 20L))
    val quotaMap = Map("a" -> 100L, "b" -> 25L)
    val consumed = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    Seq(0L, 1L).foreach { ep =>
      survivors(ep).groupBy(_._2).toSeq.sortBy(_._1).foreach { case (src, ds) =>
        quotaMap.get(src).foreach { quota =>
          ds.sortBy(d => (md5hex(d._1), d._1)).foreach { case (id, _, text) =>
            if (consumed(src) < quota) {
              expected += ((ep, id)); consumed(src) += text.split("\\s+").length.toLong
            }
          }
        }
      }
    }
    def accepted() = spark.read.parquet(acceptedPath).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"))).toSet
    accepted() shouldBe expected.toSet
    // the binding interaction + membership pins, explicitly:
    accepted() should contain allOf ((0L, 12L), (0L, 13L)) // rejected docs consumed NOTHING
    accepted() should contain((1L, 21L)) // near-dup of an UNADMITTED doc sails through
    accepted().map(_._2) should contain noneOf (16L, 22L)
    def ledger() = spark.read.parquet(statePath).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[String]("source"),
        r.getAs[Long]("consumed_tokens")))
      .groupBy(_._2).view.mapValues(_.maxBy(_._1)._3).toMap
    ledger() shouldBe consumed.toMap
    ledger()("a") shouldBe 110L // 40+40 (epoch 0) + 30 (epoch 1); never 10/11/14's mass

    // the index holds EXACTLY seed + fully-admitted docs
    def indexIds() = spark.read.parquet(indexPath).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    val admittedIds = expected.map(_._2).toSet
    indexIds() shouldBe (Seq(1L, 2L) ++ admittedIds).sorted

    // SAME-EPOCH REDELIVERY through the factored composed body: every
    // artifact and the index converge byte-identically
    val before = (dec.toSet, accepted(), ledger(), indexIds(),
      spark.read.parquet(hitsPath).count())
    DocStream.admitBatch(b2.toDF("doc_id", "source", "text"), 1L, ev, quotas,
      indexPath, deconPath, hitsPath, statePath, acceptedPath)
    val after = (spark.read.parquet(deconPath).collect()
        .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"),
          r.getAs[Boolean]("admitted"))).toSet,
      accepted(), ledger(), indexIds(), spark.read.parquet(hitsPath).count())
    after shouldBe before
  }

  test("composed admission: intra-batch phantom rejection is epoch-local — dup of a quota-cut peer stays out this epoch, same text admitted fresh next epoch") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("admit-phantom").toString
    val indexPath = s"$base/sigs"
    val Seq(deconPath, hitsPath, statePath, acceptedPath) =
      Seq("decon", "hits", "state", "accepted").map(p => s"$base/$p")

    val ev = TextQueries.evalGramTable(
      Seq((900L, "g1 g2 g3 g4 g5 g6")).toDF("doc_id", "text")).cache()
    ev.count()
    graft.sources.Sinks.sortedParquet(
      TextQueries.minhashSignaturesOf(
        Seq((1L, (1 to 30).map(i => s"seed$i").mkString(" "))).toDF("doc_id", "text")),
      indexPath, Seq("doc_id"))
    // z's quota is exhausted by the FILLER (md5("30") < md5("31"): the
    // x53 hash order puts 30 first), so the REP 31 is quota-cut — after
    // its dup 32 was already rejected against it at the dup axis
    val quotas = Seq(("z", 5L), ("y", 100L)).toDF("source", "quota_tokens")
    val repText = (1 to 29).map(i => s"zr$i").mkString(" ") + " omega"
    val dupText = (1 to 29).map(i => s"zr$i").mkString(" ") + " kappa"
    DocStream.admitBatch(Seq(
      (30L, "z", (1 to 10).map(i => s"zf$i").mkString(" ")), // filler: admitted, spends z
      (31L, "z", repText),                                   // rep: survives dup, quota-CUT
      (32L, "z", dupText)                                    // dup of 31 → phantom-rejected
    ).toDF("doc_id", "source", "text"), 0L, ev, quotas,
      indexPath, deconPath, hitsPath, statePath, acceptedPath)

    def accepted() = spark.read.parquet(acceptedPath).collect()
      .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"))).toSet
    // epoch 0: ONLY the filler shipped; 32 was rejected against text (31's)
    // that never joined the corpus — the documented epoch-local phantom
    accepted() shouldBe Set((0L, 30L))
    spark.read.parquet(hitsPath).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("corpus_doc_id"))).toSet shouldBe
      Set((32L, 31L))
    spark.read.parquet(indexPath).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq shouldBe Seq(1L, 30L) // 31 never indexed

    // epoch 1: the SAME text (32's) under a funded source is judged on its
    // own merits — no index row for 31/32 exists to reject it against
    DocStream.admitBatch(Seq((33L, "y", dupText)).toDF("doc_id", "source", "text"),
      1L, ev, quotas, indexPath, deconPath, hitsPath, statePath, acceptedPath)
    accepted() shouldBe Set((0L, 30L), (1L, 33L))
    spark.read.parquet(hitsPath).count() shouldBe 1L // no new hit was logged
  }

  test("composed admission restart-from-checkpoint: in-flight epoch replayed after automated committed-ledger compaction converges with an uninterrupted run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    // r17 verdict item 2: DocStreamSpec proved the BATCH-BODY semantics
    // under redelivery, but never stopped a live admission() and restarted
    // it from its checkpointLocation — the lifecycle edge where the commit
    // log, not the spec harness, decides what replays. This drives exactly
    // that: two committed epochs, stop, [[Sinks.compactCommitted]] derives
    // upTo=1 from the commit log (verdict item 5's automation), an
    // in-flight epoch 2 whose body effects hit disk but whose commit never
    // landed, then a restart that must replay epoch 2 against the FOLDED
    // ledger and carry on to epoch 3.
    def d40(p: String): String = (1 to 40).map(i => s"$p$i").mkString(" ")
    val batches = Seq(
      Seq((10L, "a", d40("aa"))),
      // 15 near-dups the admitted 10 → dup-rejected, consumes nothing
      // (and gives the hit log a row, so every artifact path is exercised)
      Seq((11L, "a", d40("ab")),
        (15L, "a", (1 to 39).map(i => s"aa$i").mkString(" ") + " zz")),
      // epoch 2 is where the as-of ledger read BINDS: consumed(a)=80 < 100
      // admits 12 (→120), which must then cut 13 — a wrong post-compaction
      // window (empty, or including epoch 2's own half-committed rows on
      // replay) admits both or neither
      Seq((12L, "a", d40("ac")), (13L, "a", d40("ad"))),
      Seq((14L, "a", d40("ae"))))
    val quotas = Seq(("a", 100L)).toDF("source", "quota_tokens")
    val ev = TextQueries.evalGramTable(
      Seq((900L, "g1 g2 g3 g4 g5 g6")).toDF("doc_id", "text")).cache()
    ev.count()

    def mkPaths(tag: String): (String, Seq[String]) = {
      val base = java.nio.file.Files.createTempDirectory(s"admit-rst-$tag").toString
      val index = s"$base/sigs"
      graft.sources.Sinks.sortedParquet(
        TextQueries.minhashSignaturesOf(
          Seq((1L, (1 to 30).map(i => s"seed$i").mkString(" "))).toDF("doc_id", "text")),
        index, Seq("doc_id"))
      (base, index +: Seq("decon", "hits", "state", "accepted").map(p => s"$base/$p"))
    }
    def stateOf(paths: Seq[String]) = {
      val Seq(index, decon, hits, state, accepted) = paths
      (spark.read.parquet(decon).collect()
        .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"),
          r.getAs[Boolean]("admitted"))).toSet,
       spark.read.parquet(hits).count(),
       spark.read.parquet(accepted).collect()
         .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"))).toSet,
       spark.read.parquet(state).collect()
         .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[String]("source"),
           r.getAs[Long]("consumed_tokens")))
         .groupBy(_._2).view.mapValues(_.maxBy(_._1)._3).toMap,
       spark.read.parquet(index).collect().map(_.getAs[Long]("doc_id")).sorted.toSeq)
    }

    // ---- interrupted run: 2 committed epochs, stop, compact, crash-replay
    val (base, paths) = mkPaths("live")
    val Seq(indexPath, deconPath, hitsPath, statePath, acceptedPath) = paths
    val input = MemoryStream[(Long, String, String)]
    def start() = DocStream.admission(input.toDF.toDF("doc_id", "source", "text"),
      ev, quotas, indexPath, deconPath, hitsPath, statePath, acceptedPath, s"$base/ckpt")
    val q1 = start()
    try {
      input.addData(batches(0)); q1.processAllAvailable()
      input.addData(batches(1)); q1.processAllAvailable()
    } finally q1.stop()
    // automated precondition: upTo comes from the commit log, not a guess
    graft.sources.Sinks.lastCommittedEpoch(spark, s"$base/ckpt") shouldBe Some(1L)
    graft.sources.Sinks.compactCommitted(spark, s"$base/ckpt", statePath,
      "source", "consumed_tokens") shouldBe Some(1L)
    new java.io.File(statePath).list().filter(_.startsWith("__epoch="))
      .toSeq shouldBe Seq("__epoch=1") // epochs 0-1 really folded
    // epoch 2 "in flight at stop": body effects on disk, commit never lands
    DocStream.admitBatch(batches(2).toDF("doc_id", "source", "text"), 2L, ev,
      quotas, indexPath, deconPath, hitsPath, statePath, acceptedPath)
    // restart from the SAME checkpoint: batch 2 must be REPLAYED (it has no
    // commit-log entry), then the stream moves on
    val q2 = start()
    try {
      input.addData(batches(2)); q2.processAllAvailable()
      input.addData(batches(3)); q2.processAllAvailable()
    } finally q2.stop()
    graft.sources.Sinks.lastCommittedEpoch(spark, s"$base/ckpt") shouldBe Some(3L)

    // ---- mirror: the same four epochs uninterrupted, no compaction
    val (_, mPaths) = mkPaths("mirror")
    batches.zipWithIndex.foreach { case (rows, ep) =>
      DocStream.admitBatch(rows.toDF("doc_id", "source", "text"), ep.toLong, ev,
        quotas, mPaths(0), mPaths(1), mPaths(2), mPaths(3), mPaths(4))
    }
    stateOf(paths) shouldBe stateOf(mPaths)
    // and the binding epoch-2 cut landed the one right way: 12 in, 13 cut
    // at 120 ≥ 100, and post-restart epoch 3's 14 cut against the spent
    // budget (the stream really continued past the replay)
    stateOf(paths)._3 shouldBe Set((0L, 10L), (1L, 11L), (2L, 12L))
    stateOf(paths)._1.map(_._1) should contain(3L) // epoch 3 was processed
  }

  test("quota ledger compaction mid-stream: post-compaction epochs and replays see identical as-of state") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("quota-compact").toString
    def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")
    val quotas = Seq(("a", 100L), ("b", 50L)).toDF("source", "quota_tokens")
    val epochs = Seq(
      0L -> Seq((1L, "a", doc(40)), (2L, "a", doc(40)), (3L, "b", doc(30))),
      1L -> Seq((4L, "a", doc(10)), (5L, "b", doc(15))),
      2L -> Seq((6L, "a", doc(30)), (7L, "b", doc(20))))

    // two mirrored runs of the SAME stream; one compacts after epoch 1
    def run(tag: String, compactAfter1: Boolean): (Set[(Long, Long, Long)], Map[String, Long]) = {
      val st = s"$base/$tag/state"; val acc = s"$base/$tag/accepted"
      epochs.foreach { case (ep, rows) =>
        if (compactAfter1 && ep == 2L)
          graft.sources.Sinks.compactEpochLedger(spark, st, upTo = 1L,
            "source", "consumed_tokens")
        DocStream.quotaAdmitBatch(rows.toDF("doc_id", "source", "text"),
          ep, quotas, st, acc)
      }
      val a = spark.read.parquet(acc).collect()
        .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"),
          r.getAs[Long]("offset_tokens"))).toSet
      val l = spark.read.parquet(st).collect()
        .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[String]("source"),
          r.getAs[Long]("consumed_tokens")))
        .groupBy(_._2).view.mapValues(_.maxBy(_._1)._3).toMap
      (a, l)
    }
    val plain = run("plain", compactAfter1 = false)
    val compacted = run("compact", compactAfter1 = true)
    // the fold changed NOTHING the admission path reads: same admitted
    // rows WITH OFFSETS, same cumulative ledger
    compacted shouldBe plain
    // ...but it really did fold the directories
    val stC = new org.apache.hadoop.fs.Path(s"$base/compact/state")
    val dirs = stC.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(stC).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("__epoch=")).sorted.toSeq
    dirs shouldBe Seq("__epoch=1", "__epoch=2")
    // an epoch REPLAYED after its predecessors were compacted reads the
    // folded base as its strictly-before window and converges (epoch 2 is
    // the only replayable epoch here — 0 and 1 are committed-and-folded,
    // which is exactly the compaction precondition)
    DocStream.quotaAdmitBatch(epochs(2)._2.toDF("doc_id", "source", "text"),
      2L, quotas, s"$base/compact/state", s"$base/compact/accepted")
    val afterAcc = spark.read.parquet(s"$base/compact/accepted").collect()
      .map(r => (r.getAs[Number]("__epoch").longValue, r.getAs[Long]("doc_id"),
        r.getAs[Long]("offset_tokens"))).toSet
    afterAcc shouldBe plain._1
  }

  test("nearDupAdmission fails fast when an indexed doc_id arrives rebound to different text") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("mh-collide").toString
    val indexPath = s"$base/sigs"
    def text(prefix: String): String = (1 to 30).map(i => s"$prefix$i").mkString(" ")
    val seed = Seq((1L, text("w")), (2L, text("q")))
    graft.sources.Sinks.sortedParquet(
      TextQueries.minhashSignaturesOf(seed.toDF("doc_id", "text")), indexPath, Seq("doc_id"))

    // id 1 arrives REBOUND to unrelated text — the id-keyed replay hygiene
    // would silently drop its flags and never re-admit it (r15 advice), so
    // the batch must DIE, not admit either half
    val input = MemoryStream[(Long, String)]
    val q = DocStream.nearDupAdmission(
      input.toDF.toDF("doc_id", "text"), indexPath, s"$base/hits", s"$base/ckpt")
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { input.addData(Seq((1L, text("z")))); q.processAllAvailable() }
      finally q.stop()
    }
    val msgs = Iterator.iterate(thrown: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    msgs should include("rebound")
    // the index is untouched by the poisoned batch
    spark.read.parquet(indexPath).collect()
      .map(_.getAs[Long]("doc_id")).sorted shouldBe Array(1L, 2L)

    // whereas a REPLAY of an identical-text id (the legitimate collision —
    // the at-least-once append) still sails through and converges
    val input2 = MemoryStream[(Long, String)]
    val q2 = DocStream.nearDupAdmission(
      input2.toDF.toDF("doc_id", "text"), indexPath, s"$base/hits2", s"$base/ckpt2")
    try { input2.addData(Seq((1L, text("w")))); q2.processAllAvailable() } finally q2.stop()
    spark.read.parquet(indexPath).collect()
      .map(_.getAs[Long]("doc_id")).sorted shouldBe Array(1L, 2L)
  }
}
