package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

// registry: x43_ev_zorder (the z-order layout key query rides this kernel;
// value gate = DuckDB oracle + the interleaving bit-walk replay below)
class ZOrderSpec extends AnyFunSuite with Matchers with SparkTestBase {

  /** Naive bit-loop reference: interleave bit-by-bit. */
  private def zRef(a: Long, b: Long): Long = {
    var z = 0L
    for (j <- 0 until 21) {
      z |= ((a >> j) & 1L) << (2 * j)
      z |= ((b >> j) & 1L) << (2 * j + 1)
    }
    z
  }

  test("mask-and-shift curve ≡ naive bit interleave on random and edge inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 21) - 1, (1L << 21) - 1),
      ((1L << 21), 5L) /* out of range: masks to 0 */ ) ++
      (1 to 500).map(_ => (rnd.nextLong(1L << 21), rnd.nextLong(1L << 21)))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    got.toSeq shouldBe cases.map { case (a, b) => zRef(a & 0x1FFFFF, b & 0x1FFFFF) }
  }

  test("locality: a 2^k-aligned tile occupies one contiguous z range") {
    // within an aligned 8x8 tile the low 6 z-bits vary and the high bits are
    // constant — the property that makes min/max pruning effective on both
    // dimensions at once
    val tile = for (a <- 16 until 24; b <- 40 until 48) yield zRef(a, b)
    tile.max - tile.min shouldBe 63L
    tile.toSet.size shouldBe 64 // and the curve is a bijection on the tile
  }

  test("zOrderedParquet writes disjoint per-file z ranges (the pruning index)") {
    import spark.implicits._
    val rnd = new scala.util.Random(47L)
    val df = (1 to 4000).map(_ => (rnd.nextLong(1000), rnd.nextLong(1000)))
      .toDF("ua", "ub")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    graft.sources.Sinks.zOrderedParquet(df, dir, "ua", "ub", numFiles = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    files.length should be > 1
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("__z"), max("__z")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => hi should be <= lo
      case _ => ()
    }
    // round-trip: no rows lost, z matches the expression on the data
    spark.read.parquet(dir).count() shouldBe 4000L
  }
}
