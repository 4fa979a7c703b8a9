package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Catalog, SparkTestBase}

/** Third differential (beyond DuckDB and the golden fixtures): the declared
  * oracle SQL is ANSI-portable, so Spark SQL itself must produce the same
  * result as the DataFrame program — proving the two API surfaces of this
  * engine agree, and that the oracle text really is engine-neutral.
  *
  * Registry coverage (this suite value-tests every member of
  * CoreQueries.all, one generated test per query — RepoHygieneSpec pins
  * these names to a covering spec file): q01_filter_project,
  * q02_inlist_compound, q03_star_join, q04_left_join_fill, q05_anti_join,
  * q06_semi_join, q07_cast_join, q08_multi_agg, q09_count_distinct,
  * q10_median, q11_having, q12_pivot, q13_lag_diff, q14_second_diff,
  * q15_first_qualifying, q16_topk, q17_union_all, q18_scalar_pipeline,
  * q19_freq_subset, q20_bounds_clamp, q21_summary_stats, q22_string_funcs,
  * q23_ordered_slice, q24_mean_join_back, q25_histogram, x34_profile_orders,
  * x49_ri_audit, x50_deciles, x87_target_encode.
  */
class SqlParitySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols: _*).collect().toSeq
      .map(r => cols.indices.map(i => String.valueOf(r.get(i))))
  }

  CoreQueries.all.foreach { q =>
    test(s"${q.name}: spark.sql(oracle) ≡ DataFrame program") {
      Catalog.registerAll(spark, dir)
      val viaSql = canon(spark.sql(q.oracle.get))
      val viaApi = canon(q.run(spark, dir))
      viaSql.size shouldBe viaApi.size
      viaSql shouldBe viaApi
    }
  }
}
