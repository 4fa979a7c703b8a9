package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The Spark-side multimodal plumbing is real even though the codec is a
  * stub: schema, batch shape, determinism, and column pruning are all
  * asserted here.
  *
  * registry: x18_media_features, x23_media_resize (both ride the extractors
  * gated here; value gate = the FNV-in-SQL / integer DuckDB oracles). */
class MediaSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val media = Media.syntheticMedia(spark, 30).cache()

  test("feature extraction emits fixed-width vectors per payload") {
    val f = Media.extractFeatures(media, dim = 16)
    f.count() shouldBe 30
    val row = f.orderBy("media_id").collect()(0)
    row.getSeq[Float](3).length shouldBe 16
    row.getAs[Int]("n_bytes") shouldBe 64
  }

  test("extraction is deterministic (stable across retries)") {
    val a = Media.extractFeatures(media).orderBy("media_id").collect()
    val b = Media.extractFeatures(media).orderBy("media_id").collect()
    a.map(_.getLong(2)).toSeq shouldBe b.map(_.getLong(2)).toSeq
    a.map(_.getSeq[Float](3).toList).toSeq shouldBe b.map(_.getSeq[Float](3).toList).toSeq
  }

  test("video frame sampling explodes k offsets per video") {
    val frames = Media.sampleVideoFrames(media, framesPerVideo = 4)
    val perVideo = frames.groupBy("media_id").count().collect()
    all(perVideo.map(_.getLong(1))) shouldBe 4L
    // uniform stride: first sample of a 1000 ms video sits at 125 ms
    Media.DecodeStub.sampleFrames(1000L, 4).toSeq shouldBe Seq(125L, 375L, 625L, 875L)
    // the Catalyst expression path reproduces the stub's arithmetic exactly
    // (media_id 2 is a video with duration 3000 ms)
    import org.apache.spark.sql.functions.col
    frames.filter(col("media_id") === 2).orderBy("frame_ms")
      .collect().map(_.getLong(1)).toSeq shouldBe
      Media.DecodeStub.sampleFrames(3000L, 4).toSeq
  }

  test("image resize emits fixed-size thumbnails matching the stub kernel") {
    val t = Media.resizeImages(media, outW = 8, outH = 8)
    t.count() shouldBe 10 // only the image rows
    val row = t.orderBy("media_id").collect()(0) // media_id 0: 64-byte payload
    val payload = Array.tabulate[Byte](64)(j => ((j * 7) % 251).toByte)
    val expected = Media.DecodeStub.resizeImage(payload, 32, 32, 8, 8)
    row.getAs[Array[Byte]]("pixels").toSeq shouldBe expected.toSeq
    row.getAs[Long]("px_sum") shouldBe expected.map(_ & 0xff).map(_.toLong).sum
  }

  test("metadata stats never touch the payload column (pruning)") {
    val stats = Media.mediaStats(media)
    stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("image" -> 10L, "audio" -> 10L, "video" -> 10L)
    // the pruning Project extracts only meta fields, never `content`
    val projectLine = stats.queryExecution.optimizedPlan.toString
      .linesIterator.find(_.trim.startsWith("+- Project")).get
    projectLine should include("meta#")
    projectLine should not include "content#"
  }

  test("aHash matches a from-scratch bit walk of the stub thumbnail") {
    val hashes = Media.imageHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    hashes.keySet shouldBe (0 until 30 by 3).map(_.toLong).toSet // image rows only
    // recompute media_id 3's hash from the raw stub chain
    val payload = Array.tabulate[Byte](64 + 3)(j => ((3 * 31 + j * 7) % 251).toByte)
    val px = Media.DecodeStub.resizeImage(payload, 32, 32, 8, 8)
    val sum = px.map(b => (b & 0xff).toLong).sum
    var expected = 0L
    px.zipWithIndex.foreach { case (b, i) =>
      if ((b & 0xff).toLong * 64L > sum) expected |= (1L << i)
    }
    hashes(3L) shouldBe expected
    // determinism across invocations (retry-stability, the stub contract)
    Media.imageHashes(media).collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap shouldBe hashes
  }

  test("planted near-dup twins land within hamming 8 of their base image") {
    val withDups = Media.syntheticMediaWithDups(spark, 300)
    val hashes = Media.imageHashes(withDups).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = (0 until 300 by 15).map(i => (i.toLong, 1000L + i))
    val hams = planted.map { case (a, b) =>
      java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    }
    // most twins are recoverable; at least one drifts past the threshold
    // (the query must MISS it — recall honesty, not a bug)
    hams.count(_ <= 8) should be >= 15
    hams.count(_ > 8) should be >= 1
    // base rows are untouched by the dup injection
    val baseHashes = Media.imageHashes(Media.syntheticMedia(spark, 300)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    baseHashes.foreach { case (id, h) => hashes(id) shouldBe h }
  }

  test("MIH ≡ brute force; catches the adversarial spread the 8-bit banding misses") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rand = (1L to 400L).map(_ -> rnd.nextLong())
    // adversarial planted pair: EXACTLY one flip in each 8-bit band (8
    // flips total) — every 8-bit band differs, so the banded heuristic
    // cannot see it; each 16-bit MIH band carries 2 flips = radius 2, so
    // the pigeonhole guarantee must
    val base = rnd.nextLong()
    val spread = (0 until 8).foldLeft(base)((h, k) => h ^ (1L << (8 * k + (k % 8))))
    java.lang.Long.bitCount(base ^ spread) shouldBe 8
    val hashes = (rand ++ Seq(9001L -> base, 9002L -> spread)).toDF("media_id", "ahash")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val mih = pairs(Media.phashNearDupPairsMih(hashes, tau = 8))
    val brute = (for {
      (a, ha) <- rand ++ Seq(9001L -> base, 9002L -> spread)
      (b, hb) <- rand ++ Seq(9001L -> base, 9002L -> spread) if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 8
    } yield (a, b, d)).toSet
    mih shouldBe brute // EXACT — the pigeonhole guarantee, verified
    mih should contain((9001L, 9002L, 8))
    // and the 8-bit banding indeed misses the adversarial spread
    pairs(Media.phashNearDupPairs(hashes, nBands = 8, tau = 8)) should not contain
      ((9001L, 9002L, 8))
  }
}
