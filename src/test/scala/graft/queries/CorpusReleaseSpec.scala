package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Gates for the corpus-release operators: x56 shard materialization
  * (permutation, contiguity, determinism, order decorrelation) and x57
  * datasheet rollup (super-aggregate consistency). */
class CorpusReleaseSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("x56 shards: exact permutation, contiguous positions, reproducible") {
    val out = TextQueries.corpusShards.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    out.length.toLong shouldBe nDocs
    out.map(_._1).distinct.length shouldBe out.length // every doc exactly once
    out.map(_._2).toSet.subsetOf((0 to 15).toSet) shouldBe true
    // positions are 1..n contiguous within every shard
    out.groupBy(_._2).values.foreach { s =>
      s.map(_._3).sorted shouldBe (1L to s.length.toLong)
    }
    // content-independent hash layout is run-to-run stable
    val again = TextQueries.corpusShards.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    again shouldBe out
    // decorrelation: consecutive input ids do NOT land in one shard
    val byDoc = out.map(r => r._1 -> r._2).toMap
    val ids = byDoc.keys.toSeq.sorted.take(32)
    ids.map(byDoc).distinct.length should be > 4
  }

  test("x59 release manifest: accounts for every gate-passing doc, dedups, splits, shards") {
    import org.apache.spark.sql.functions.{col, split, trim, size => asize}
    val out = TextQueries.releaseManifest.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3), r.getLong(4)))
    val nQual = graft.Tables.documents(spark, sf)
      .filter(asize(split(trim(col("text")), "\\s+")) >= 40).count()
    nQual should be < 500L // the gate actually drops docs on the shipped corpus
    out.map(_._2).sum shouldBe nQual // every surviving doc represented exactly once
    out.length.toLong should be < nQual // ...and the dedup stage actually collapses
    out.map(_._1).distinct.length shouldBe out.length
    // split = first md5 hex digit of the rep, shard = second: recompute per row
    def hex(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out.foreach { case (id, _, split, shard, _) =>
      val h = hex(id)
      split shouldBe (if (h.head <= 'b') "train" else if (h.head <= 'd') "val" else "test")
      shard shouldBe Integer.parseInt(h.substring(1, 2), 16)
    }
    out.map(_._3).toSet shouldBe Set("train", "val", "test")
    out.map(_._4).toSet shouldBe (0 to 15).toSet // every split spans all shards overall
    out.groupBy(_._4).values.foreach { s => // contiguous loader positions per shard
      s.map(_._5).sorted shouldBe (1L to s.length.toLong)
    }
  }

  test("x57 datasheet: TOTAL row is the exact sum/rollup of the source rows") {
    val rows = TextQueries.datasheetRollup.run(spark, sf).collect()
    val (total, per) = rows.partition(_.getString(0) == "TOTAL")
    total.length shouldBe 1
    per.length should be > 1
    val t = total.head
    t.getLong(1) shouldBe per.map(_.getLong(1)).sum // n_docs
    t.getLong(2) shouldBe per.map(_.getLong(2)).sum // n_tokens
    t.getLong(3) shouldBe per.map(_.getLong(3)).sum // n_chars
    // langs: the super-aggregate is a distinct over the union, so it is
    // bounded by the per-source max and the 5 shipped languages
    t.getLong(4) should be >= per.map(_.getLong(4)).max
    t.getLong(4) should be <= 5L
    t.getDouble(5) shouldBe (t.getLong(3).toDouble / t.getLong(1)) +- 1e-6
  }
}
