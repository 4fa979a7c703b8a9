package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkTestBase, Tables}

/** x113's mergeability contract: the stored datasheet statistics form a
  * commutative monoid — merge(stats(A), stats(B)) must equal stats(A ∪ B)
  * column by column, in any merge order, through a parquet round-trip, and
  * WITHOUT the corpus (the artifact replaces the scan). The DuckDB oracle
  * proves the shipped corpus; these prove the algebra on adversarial
  * shapes (one-sided sources, disjoint lang sets, empty batch). */
class DatasheetStatsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def mkDocs(rows: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "lang", "text")
  }

  /** Collect a stats frame to a comparable shape (langs as a SET — the
    * collect_set order is nondeterministic by contract). */
  private def shape(stats: DataFrame): Map[String, (Long, Long, Long, Set[String], Long, Long)] =
    stats.collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[String](4).toSet, r.getLong(5), r.getLong(6)))
    }.toMap

  private val da = Seq(
    (1L, "web", "en", "alpha beta gamma"),
    (2L, "web", "de", "delta"),
    (3L, "wiki", "en", "epsilon zeta eta theta iota"))
  private val db = Seq(
    (4L, "web", "fr", "kappa lambda"), // overlapping source, NEW lang
    (5L, "books", "en", "mu"), // source only in the batch
    (6L, "wiki", "en", "nu xi")) // overlapping source, same lang

  test("merge(stats(A), stats(B)) ≡ stats(A ∪ B) — incl. one-sided sources and new langs") {
    val merged = TextQueries.mergeDatasheets(
      TextQueries.datasheetStatsOf(mkDocs(da)), TextQueries.datasheetStatsOf(mkDocs(db)))
    shape(merged) shouldBe shape(TextQueries.datasheetStatsOf(mkDocs(da ++ db)))
  }

  test("merge is commutative and associative (batches fold in any order)") {
    val c = Seq((7L, "web", "es", "omicron pi rho sigma"))
    val Seq(sa, sb, sc) =
      Seq(da, db, c).map(rows => TextQueries.datasheetStatsOf(mkDocs(rows)))
    val abc = shape(TextQueries.datasheetStatsOf(mkDocs(da ++ db ++ c)))
    shape(TextQueries.mergeDatasheets(TextQueries.mergeDatasheets(sa, sb), sc)) shouldBe abc
    shape(TextQueries.mergeDatasheets(sa, TextQueries.mergeDatasheets(sc, sb))) shouldBe abc
    shape(TextQueries.mergeDatasheets(sb, sa)) shouldBe
      shape(TextQueries.mergeDatasheets(sa, sb))
  }

  test("an empty batch is the monoid identity") {
    val stored = TextQueries.datasheetStatsOf(mkDocs(da))
    val empty = TextQueries.datasheetStatsOf(mkDocs(da).filter(lit(false)))
    empty.count() shouldBe 0L // groupBy of zero rows: no identity rows invented
    shape(TextQueries.mergeDatasheets(stored, empty)) shouldBe shape(stored)
  }

  test("artifact round-trip: save → load → merge, with the corpus GONE") {
    val dir = java.nio.file.Files.createTempDirectory("datasheet").toString + "/stats"
    TextQueries.saveDatasheet(TextQueries.datasheetStatsOf(mkDocs(da)), dir)
    val loaded = TextQueries.loadDatasheet(spark, dir)
    // nothing below touches the corpus frame — the artifact replaces the scan
    val merged = TextQueries.mergeDatasheets(loaded, TextQueries.datasheetStatsOf(mkDocs(db)))
    shape(merged) shouldBe shape(TextQueries.datasheetStatsOf(mkDocs(da ++ db)))
  }

  test("the contract is load-bearing: the two classic WRONG merges fail it") {
    // an artifact that stores derived values instead of monoid components
    // cannot merge — prove the reconciliation these specs (and the x113
    // oracle hash) run would actually CATCH both textbook mistakes,
    // rather than passing any plausible-looking merge
    val sa = TextQueries.datasheetStatsOf(mkDocs(da)).collect()
      .map(r => r.getString(0) -> r).toMap
    val sb = TextQueries.datasheetStatsOf(mkDocs(db)).collect()
      .map(r => r.getString(0) -> r).toMap
    val truth = shape(TextQueries.datasheetStatsOf(mkDocs(da ++ db)))
    // WRONG 1: store n_langs and ADD counts instead of unioning sets —
    // 'wiki' is en on both sides, so count-adding doubles it
    val wrongLangs = sa("wiki").getSeq[String](4).size + sb("wiki").getSeq[String](4).size
    wrongLangs should not be truth("wiki")._4.size
    // WRONG 2: store the mean and AVERAGE the partials instead of deriving
    // from merged sums — 'web' has unequal side weights, so it diverges
    def mean(r: org.apache.spark.sql.Row) = r.getLong(3).toDouble / r.getLong(1)
    val wrongMean = (mean(sa("web")) + mean(sb("web"))) / 2
    val trueMean = truth("web")._3.toDouble / truth("web")._1
    math.abs(wrongMean - trueMean) should be > 1e-9
  }

  test("x113 on the shipped corpus: merged steady state ≡ one-pass recompute") {
    val dir = "/root/testdata/sf0.001"
    val all = Tables.documents(spark, dir)
    val artifact = java.nio.file.Files.createTempDirectory("datasheet-c").toString + "/stats"
    TextQueries.saveDatasheet(
      TextQueries.datasheetStatsOf(all.filter(col("doc_id") % 10 =!= 0)), artifact)
    val merged = TextQueries.mergeDatasheets(
      TextQueries.loadDatasheet(spark, artifact),
      TextQueries.datasheetStatsOf(all.filter(col("doc_id") % 10 === 0)))
    shape(merged) shouldBe shape(TextQueries.datasheetStatsOf(all))
    // non-vacuity: the batch side actually contributed rows to every source
    val batchSources = all.filter(col("doc_id") % 10 === 0)
      .select("source").distinct().count()
    batchSources should be > 0L
  }
}
