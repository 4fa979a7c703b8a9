package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.queries.SimilarityQueries

/** The streaming IVF cell census must BE the batch census — the two share
  * the fold (`cellCensusStatsOf`) verbatim, and this spec pins that the
  * streamed state over two arrival batches equals the batch aggregate on
  * the union, on the REAL shipped embeddings. */
class EmbStreamSpec extends AnyFunSuite with Matchers with SparkTestBase {

  // registry: x65_ivf_cells (cellCensusStatsOf is x65's fold, shared with
  // the streaming twin tested here)
  test("streamed cell census over two batches ≡ batch census on the union (real vectors)") {
    import spark.implicits._

    val rows = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val (b1, b2) = rows.splitAt(300) // second arrival really merges into state

    val input = MemoryStream[(Long, Seq[Float], Int)]
    val emb = input.toDF.toDF("vec_id", "embedding", "label")
    val q = EmbStream.cellCensusUpdates(emb)
      .writeStream.format("memory").queryName("cellcensus").outputMode("update").start()
    val updates = try {
      input.addData(b1.toSeq)
      q.processAllAvailable()
      input.addData(b2.toSeq)
      q.processAllAvailable()
      spark.table("cellcensus").collect()
    } finally q.stop()

    // n is monotone per (cell, label) → the max emission is the final state
    val latest = updates.groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).max }
    val batch = SimilarityQueries.cellCensusStatsOf(
      rows.toSeq.toDF("vec_id", "embedding", "label")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    latest shouldBe batch

    // conservation against the registry's x65 rollup on the same corpus:
    // per-cell vector mass from the streamed state equals x65's n_vecs
    val x65 = SimilarityQueries.simIvfCells.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val perCell = latest.groupBy(_._1._1).map { case (c, g) => c -> g.values.sum }
    perCell shouldBe x65
    // and the stream really merged: at least one (cell, label) key grew
    // across the two batches (two update emissions for the same key)
    updates.groupBy(r => (r.getInt(0), r.getInt(1))).values
      .count(_.size >= 2) should be > 0
  }

  // registry: x145_ann_outlier_census (outlierStatsOf is x145's fold,
  // shared verbatim with the streaming twin tested here)
  test("streamed outlier census over two batches ≡ batch fold on the union; derives x145 exactly") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01" // the corpus the pinned index is synced to
    val rows = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (b1, b2) = rows.splitAt(300) // second arrival really merges into state

    val input = MemoryStream[(Long, Seq[Float])]
    val q = EmbStream.outlierCensusUpdates(input.toDF.toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("outliercensus").outputMode("update").start()
    val updates = try {
      input.addData(b1.toSeq)
      q.processAllAvailable()
      input.addData(b2.toSeq)
      q.processAllAvailable()
      spark.table("outliercensus").collect()
    } finally q.stop()

    // n_vecs is monotone per cell → the max emission is the final state
    val latest = updates.groupBy(_.getInt(0)).map { case (c, rs) =>
      val r = rs.maxBy(_.getLong(1))
      c -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }
    val batch = SimilarityQueries.outlierStatsOf(
      rows.toSeq.toDF("vec_id", "embedding")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    latest shouldBe batch

    // deriving x145's published columns from the streamed state reproduces
    // the registry query on the same corpus — the dashboard and the audit
    // cannot disagree
    val x145 = SimilarityQueries.annOutlierCensus.run(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    latest.map { case (c, (n, sumOff, minPpm, nOut)) =>
      c -> ((n, sumOff / n - 1000000L, minPpm, nOut, nOut * 1000000L / n))
    } shouldBe x145
    // the min really FOLDED across batches for at least one cell (a
    // second emission with the same or lower min)
    updates.groupBy(_.getInt(0)).values.count(_.size >= 2) should be > 0
  }

  test("outlier-census restart-from-checkpoint: the per-cell (count, sum, min) state survives a stop") {
    import spark.implicits._
    // r19 verdict item 2: the two-batch test above proves the fold, but
    // never stops a live query — this drives the streaming-aggregation
    // state store across a real stop/restart. Distinguishing probe: cells
    // fed in BOTH epochs must emit post-restart counts LARGER than a
    // fresh fold of batch 2 alone — a lost state store would reset them
    // (and could not carry batch 1's min). Memory sinks can't recover a
    // checkpoint, so rows land via foreachBatch + the epoch ledger.
    val sf = "/root/testdata/sf0.01"
    val rows = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (b1, b2) = rows.splitAt(300)
    val base = java.nio.file.Files.createTempDirectory("emb-restart").toString
    val out = s"$base/led"
    val input = MemoryStream[(Long, Seq[Float])]
    def start() = EmbStream.outlierCensusUpdates(input.toDF.toDF("vec_id", "embedding"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], e: Long) =>
        EventStream.writeEpoch(b.toDF(), e, out)
      }
      .start()
    val q1 = start()
    try { input.addData(b1.toSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { input.addData(b2.toSeq); q2.processAllAvailable() } finally q2.stop()
    val led = spark.read.parquet(out).collect()
    // n_vecs is monotone per cell → max-epoch emission is the final state,
    // and it must equal the batch fold on the UNION of both arrivals
    val latest = led.groupBy(_.getAs[Int]("cell")).map { case (c, rs) =>
      val r = rs.maxBy(_.getAs[Number]("__epoch").longValue)
      c -> ((r.getAs[Long]("n_vecs"), r.getAs[Long]("sum_off"),
        r.getAs[Long]("min_cos_ppm"), r.getAs[Long]("n_outliers")))
    }
    val batch = SimilarityQueries.outlierStatsOf(
      rows.toSeq.toDF("vec_id", "embedding")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    latest shouldBe batch
    // the probe: some post-restart emission outgrew batch 2's own fold
    val b2Only = SimilarityQueries.outlierStatsOf(
      b2.toSeq.toDF("vec_id", "embedding")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val epoch1 = led.filter(_.getAs[Number]("__epoch").longValue == 1L)
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("n_vecs"))
    epoch1 should not be empty
    epoch1.exists { case (c, n) => n > b2Only.getOrElse(c, 0L) } shouldBe true
  }
}
