package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Catalog, SparkTestBase}

/** Third differential (beyond DuckDB and the golden fixtures): the declared
  * oracle SQL is ANSI-portable, so Spark SQL itself must produce the same
  * result as the DataFrame program — proving the two API surfaces of this
  * engine agree, and that the oracle text really is engine-neutral.
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
