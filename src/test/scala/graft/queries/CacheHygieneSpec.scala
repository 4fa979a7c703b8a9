package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The sketch queries materialize intermediates (lineage boundaries against
  * Catalyst's projection re-inlining) — but those blocks must not outlive
  * the query: they're GC-scoped `localCheckpoint`s, not session-lifetime
  * `persist`s, so a long-lived session (Bench runs all queries back to
  * back) doesn't accumulate cached tables until eviction. */
class CacheHygieneSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("sketch queries leave no session-lifetime cached blocks behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // run the three sketch queries to completion, dropping all references
    Seq(TextQueries.dedupMinhash, TextQueries.dedupSimhash, TextQueries.dedupNgram)
      .foreach(q => q.run(spark, dir).count())
    // localCheckpoint blocks are released by the ContextCleaner once the
    // query's DataFrames are unreachable — force GC and wait for the drain.
    var tries = 0
    def leftover = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leftover.nonEmpty && tries < 50) {
      System.gc()
      Thread.sleep(200)
      tries += 1
    }
    leftover shouldBe empty
  }
}
