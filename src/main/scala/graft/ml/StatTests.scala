package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistical tests (`WIP.R:295-299`, SURVEY.md §2.1 K11/K12):
  * pairwise Welch t-tests with Bonferroni adjustment and the Kruskal-Wallis
  * rank test — neither exists in MLlib, so both are computed from one-pass
  * DataFrame aggregates; only the tiny per-group summary reaches the driver.
  * Distribution CDFs come from breeze (ships with Spark MLlib).
  */
object StatTests {

  /** `pairwise.t.test(..., p.adj = 'bonferroni', pool.sd = FALSE)` analog:
    * one groupBy computes (n, mean, var) per group; every group pair gets a
    * Welch t statistic, Welch-Satterthwaite df, and a Bonferroni-adjusted
    * two-sided p. Output: (group_a, group_b, t, df, p_raw, p_adj). */
  def pairwiseWelch(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), avg(valueCol).as("mean"), var_samp(valueCol).as("var"))
      .collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val pairs = for {
      i <- stats.indices
      j <- (i + 1) until stats.length
    } yield {
      val (ga, na, ma, va) = stats(i)
      val (gb, nb, mb, vb) = stats(j)
      val se2 = va / na + vb / nb
      val t = (ma - mb) / math.sqrt(se2)
      val dfW = se2 * se2 /
        (va * va / (na.toDouble * na * (na - 1)) + vb * vb / (nb.toDouble * nb * (nb - 1)))
      val pRaw = 2.0 * (1.0 - breeze.stats.distributions.StudentsT(dfW)(
        breeze.stats.distributions.Rand).cdf(math.abs(t)))
      (ga, gb, t, dfW, pRaw)
    }
    val m = pairs.size.toDouble
    pairs.map { case (a, b, t, d, p) => (a, b, t, d, p, math.min(1.0, p * m)) }
      .toDF("group_a", "group_b", "t", "df", "p_raw", "p_adj")
  }

  /** Kruskal-Wallis H (kruskalmc's omnibus stat, WIP:296): mid-ranks via a
    * global value ordering — `rank()` gives the min rank of a tie group and
    * a per-value count converts it to the average rank; H from per-group
    * rank sums with the standard tie correction. The only wide operation is
    * the rank window (one shuffle on the value column). Returns (H, df, p). */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String): (Double, Long, Double) = {
    val ranked = df
      .withColumn("rk_min", rank().over(Window.orderBy(valueCol)))
      .withColumn("tie_n", count(lit(1)).over(Window.partitionBy(valueCol)))
      .withColumn("rk", col("rk_min") + (col("tie_n") - 1) / 2.0)
    val n = df.count().toDouble
    val groups = ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("n_i"), sum("rk").as("r_i"))
      .collect().map(r => (r.getLong(1).toDouble, r.getDouble(2)))
    val ties = ranked.groupBy(valueCol).count()
      .agg(sum(pow(col("count"), 3) - col("count"))).collect()(0).getDouble(0)
    val hRaw = 12.0 / (n * (n + 1)) * groups.map { case (ni, ri) => ri * ri / ni }.sum -
      3.0 * (n + 1)
    val correction = 1.0 - ties / (n * n * n - n)
    val h = hRaw / correction
    val dfH = groups.length - 1L
    val p = 1.0 - breeze.stats.distributions.ChiSquared(dfH.toDouble)(
      breeze.stats.distributions.Rand).cdf(h)
    (h, dfH, p)
  }
}
