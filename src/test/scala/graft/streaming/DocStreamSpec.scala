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
}
