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

  /** Scale-safe mid-ranks over a (value, count) table: range-partition the
    * DISTINCT values, prefix-sum the per-range-partition totals on the driver
    * (one tiny row per partition), then a PARTITIONED window adds the
    * partition-local running count — no unpartitioned window anywhere, so
    * the wide work is over |distinct values| spread across all executors,
    * never a single-task global sort (the classic distributed ranking plan).
    *
    * `f` receives a (valueCol, countCol, rank_offset, cum_before, rk)
    * DataFrame where `rk` is the mid-rank (average of the tie block's
    * ranks) of each distinct value, and `rank_offset`/`cum_before` are its
    * exact LongType components — rk = rank_offset + cum_before + 1 +
    * (count−1)/2 — so a consumer needing integer rank arithmetic (x131's
    * rank2 = 2·midrank = 2·(rank_offset+cum_before) + count + 1) can stay
    * in BIGINT end to end instead of rebuilding the integer through the
    * DOUBLE mid-rank, whose exactness silently degrades past ~2^52 total
    * count (r15 advice). The range-partitioned input is pinned by an eager
    * localCheckpoint, so `f` may return a LAZY frame consumed after this
    * call returns (cleanup is GC-scoped with the RDD). */
  def withValueRanks[T](valueCounts: DataFrame, valueCol: String, countCol: String)
      (f: DataFrame => T): T = {
    val spark = valueCounts.sparkSession
    import spark.implicits._
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    // EAGER localCheckpoint, not persist+unpersist: the per-pid offsets
    // below are FROZEN on the driver from one materialization, so the
    // (pid, row) assignment must never be recomputed — repartitionByRange
    // SAMPLES to pick boundaries, and a recomputation (cache eviction, or a
    // caller returning a LAZY frame consumed after the old finally-unpersist
    // ran — the round-15 x131 bug: rank sums silently corrupted at sf0.1)
    // can land rows in different pids than the offsets were built from. The
    // checkpoint pins the computed partitions for the RDD's lifetime;
    // cleanup is GC-scoped, so a lazily-returned frame stays consistent.
    val ranged = valueCounts.repartitionByRange(parts, col(valueCol))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val partTotals = ranged.groupBy("pid").agg(sum(countCol).cast("long").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = partTotals.toSeq.map { case (pid, c) =>
      val row = (pid, acc); acc += c; row
    }
    val offsetDf = offsets.toDF("pid", "rank_offset")
    val w = Window.partitionBy("pid").orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = ranged.join(broadcast(offsetDf), Seq("pid"))
      .withColumn("cum_before", coalesce(sum(countCol).over(w), lit(0L)))
      .withColumn("rk",
        col("rank_offset") + col("cum_before") + 1.0 + (col(countCol) - 1) / 2.0)
      .select(col(valueCol), col(countCol),
        col("rank_offset"), col("cum_before"), col("rk"))
    f(ranks)
  }

  /** Kruskal-Wallis H (kruskalmc's omnibus stat, WIP:296). The only
    * full-data shuffle is ONE groupBy on (group, value); everything after
    * operates on the distinct-value table: mid-ranks come from
    * `withValueRanks` (range partition + partitioned prefix-sum window — no
    * unpartitioned window, no global sort of the raw rows), and per-group
    * rank sums weight each distinct value's mid-rank by its (group, value)
    * count. H from rank sums with the standard tie correction.
    * Returns (H, df, p). */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String): (Double, Long, Double) = {
    val gv = df.groupBy(groupCol, valueCol).agg(count(lit(1)).as("n_gv")).persist()
    try {
      val dv = gv.groupBy(valueCol).agg(sum("n_gv").as("tie_n"))
      withValueRanks(dv, valueCol, "tie_n") { ranks =>
        val rk = ranks.withColumnRenamed(valueCol, "__rank_value")
        val totals = rk.agg(
          sum("tie_n").cast("double").as("n"),
          sum(pow(col("tie_n"), 3) - col("tie_n")).cast("double").as("ties"))
          .collect()(0)
        val n = totals.getDouble(0)
        val ties = totals.getDouble(1)
        val groups = gv.join(rk, gv(valueCol) <=> rk("__rank_value"))
          .groupBy(groupCol)
          .agg(sum("n_gv").as("n_i"), sum(col("n_gv") * col("rk")).as("r_i"))
          .collect().map(r => (r.getLong(1).toDouble, r.getDouble(2)))
        val hRaw = 12.0 / (n * (n + 1)) * groups.map { case (ni, ri) => ri * ri / ni }.sum -
          3.0 * (n + 1)
        val correction = 1.0 - ties / (n * n * n - n)
        val h = hRaw / correction
        val dfH = groups.length - 1L
        val p = 1.0 - breeze.stats.distributions.ChiSquared(dfH.toDouble)(
          breeze.stats.distributions.Rand).cdf(h)
        (h, dfH, p)
      }
    } finally { gv.unpersist(); () }
  }
}
