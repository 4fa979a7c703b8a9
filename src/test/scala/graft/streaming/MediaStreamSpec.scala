package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.multimodal.Media

/** Streaming twins of the multimodal batch path (x18/x23 shapes): the media
  * transforms are stateless, so the SAME functions must produce the SAME
  * rows when driven by micro-batches — asserted against the batch output on
  * identical synthetic blobs, across multiple triggers. */
class MediaStreamSpec extends AnyFunSuite with Matchers with SparkTestBase {

  case class Meta(media_type: String, format: String, width: Option[Int],
      height: Option[Int], duration_ms: Option[Long])
  case class MediaRow(media_id: Long, content: Array[Byte], meta: Meta)

  private val N = 60

  /** The same deterministic blobs as Media.syntheticMedia, as case classes
    * (MemoryStream needs an encoder). */
  private def rows(from: Int, until: Int): Seq[MediaRow] =
    (from until until).map { i =>
      val mediaType = Seq("image", "audio", "video")(i % 3)
      MediaRow(i.toLong,
        Array.tabulate[Byte](64 + (i % 32))(j => ((i * 31 + j * 7) % 251).toByte),
        Meta(mediaType, if (mediaType == "image") "png" else "raw",
          if (mediaType == "image") Some(32) else None,
          if (mediaType == "image") Some(32) else None,
          if (mediaType == "video") Some(1000L * (i % 10 + 1)) else None))
    }

  test("feature extraction over a stream ≡ batch on the same blobs (x18 twin)") {
    import spark.implicits._
    val input = MemoryStream[MediaRow]
    val q = Media.extractFeatures(input.toDF, dim = 16)
      .writeStream.format("memory").queryName("mfeat").outputMode("append").start()
    try {
      input.addData(rows(0, 25))
      q.processAllAvailable()
      input.addData(rows(25, N)) // second trigger: incremental, not re-read
      q.processAllAvailable()
      val streamed = spark.table("mfeat")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getSeq[Float](3))).sortBy(_._1)
      val batch = Media.extractFeatures(Media.syntheticMedia(spark, N), dim = 16)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getSeq[Float](3))).sortBy(_._1)
      streamed.length shouldBe N
      streamed shouldBe batch
    } finally q.stop()
  }

  test("image resize over a stream ≡ batch on the same blobs (x23 twin)") {
    import spark.implicits._
    val input = MemoryStream[MediaRow]
    val q = Media.resizeImages(input.toDF, outW = 8, outH = 8)
      .writeStream.format("memory").queryName("mresize").outputMode("append").start()
    try {
      input.addData(rows(0, 30))
      q.processAllAvailable()
      input.addData(rows(30, N))
      q.processAllAvailable()
      val streamed = spark.table("mresize")
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](3).toSeq, r.getLong(4)))
        .sortBy(_._1)
      val batch = Media.resizeImages(Media.syntheticMedia(spark, N), outW = 8, outH = 8)
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](3).toSeq, r.getLong(4)))
        .sortBy(_._1)
      streamed.length shouldBe N / 3 // image rows only
      streamed shouldBe batch
    } finally q.stop()
  }

  test("file-source end-to-end: readMediaStream dir → frame sampling → sink") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("media-stream").toString
    spark.createDataFrame(spark.sparkContext.parallelize(
      Media.syntheticMedia(spark, 30).collect().toSeq, 2), Media.mediaSchema)
      .write.parquet(s"$dir/batch1")
    val q = Media.sampleVideoFrames(Media.readMediaStream(spark, s"$dir/batch*"))
      .writeStream.format("memory").queryName("mframes").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("mframes")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val batch = Media.sampleVideoFrames(Media.syntheticMedia(spark, 30))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      streamed should not be empty
      streamed shouldBe batch
    } finally q.stop()
  }

  test("hash-dedup admission restart-from-checkpoint: the durable index carries verdicts across a stop; replays converge") {
    import spark.implicits._
    // r19 verdict item 2, media axis: the admission "state" is the durable
    // aHash index artifact plus the file-source commit log — both must
    // cooperate across process generations. Distinguishing probe: the
    // post-restart batch re-sends a payload admitted BEFORE the stop; only
    // the durable index (probed by the restarted query) can reject it.
    import org.apache.spark.sql.Row
    def img(id: Long, payload: Array[Byte]) =
      Row(id, payload, Row("image", "png", 32, 32, null))
    def frame(rs: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rs, 1), Media.mediaSchema)
    val pP = Array.tabulate[Byte](80)(j => (j * 7 % 251).toByte)
    val pQ = Array.tabulate[Byte](80)(j => ((j * 11 + 3) % 251).toByte)
    val pR = Array.tabulate[Byte](80)(j => ((j * 13 + 5) % 251).toByte)
    val b1 = Seq(img(1L, pP), img(2L, pP), img(3L, pQ)) // 2 is an exact dup of 1
    val b2 = Seq(img(4L, pP), img(5L, pR))              // 4 re-sends the pre-stop payload
    // the three payloads really carry three distinct fingerprints
    Media.imageHashes(frame(b1 ++ b2)).collect()
      .map(_.getLong(1)).distinct should have size 3

    val base = java.nio.file.Files.createTempDirectory("media-admission").toString
    val (watch, idx, out) = (s"$base/in", s"$base/idx", s"$base/adm")
    Media.initHashIndex(spark, idx)
    frame(b1).write.parquet(s"$watch/batch1")
    def start() = Media.hashDedupAdmission(
      Media.readMediaStream(spark, s"$watch/batch*"), idx, out, s"$base/ckpt")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    frame(b2).write.parquet(s"$watch/batch2")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    def epochIds(e: Long) = spark.read.parquet(out).collect()
      .filter(_.getAs[Number]("__epoch").longValue == e)
      .map(_.getAs[Long]("media_id")).toSet
    // pre-stop: the intra-batch dup lost to the smaller id
    epochIds(0L) shouldBe Set(1L, 3L)
    // post-restart: the re-sent payload fell to the DURABLE index verdict
    epochIds(1L) shouldBe Set(5L)
    val indexIds = spark.read.parquet(idx).collect().map(_.getAs[Long]("media_id")).toSet
    indexIds shouldBe Set(1L, 3L, 5L)

    // at-least-once replay of the committed epoch: same verdicts, no
    // index growth (the nearDupAdmission convergence contract)
    Media.hashAdmitBatch(frame(b2), 1L, idx, out)
    epochIds(1L) shouldBe Set(5L)
    spark.read.parquet(idx).count() shouldBe 3L
  }
}
