package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Equi-depth feature binning with a DURABLE edge artifact — the
  * fit/transform contract of a feature store: bin edges are learned ONCE
  * from training data (exact per-group quantiles via [[Quantiles]]) and
  * persisted; serving applies them as a broadcast + row-local bucket
  * expression with zero recomputation, so train-time and serve-time
  * binning can never drift. Completes the artifact family (IVF centroids,
  * PQ codebooks, MinHash band index, Bloom bitmap) with the tabular-ML
  * member.
  *
  * Scale shape: fitting is [[Quantiles.groupQuantiles]]'s skew-safe
  * dispatch (the fact shuffles once at most); the edges table is
  * |groups|×(nBins−1) — broadcast-sized at any corpus scale — and apply
  * is a BroadcastHashJoin plus a codegen'd array-filter count, so the
  * fact is never exchanged at serve time.
  */
object FeatureBins {

  /** Learn (nBins − 1) interior edges per group: the p = i/nBins exact
    * quantiles (interpolation ≡ PERCENTILE_CONT). Output: (group, edges
    * ARRAY<DOUBLE> ascending). */
  def fitBins(df: DataFrame, groupCol: String, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val qs = Quantiles.groupQuantiles(df, groupCol, valueCol, ps)
    qs.select(col(groupCol),
      array((0 until nBins - 1).map(i => col(s"q$i")): _*).as("edges"))
  }

  /** Persist the edges artifact (tiny parquet — one row per group). */
  def saveBins(bins: DataFrame, path: String): Unit =
    graft.sources.Sinks.parquet(bins, path)

  /** Load an edges artifact written by [[saveBins]]. */
  def loadBins(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucket the fact against learned edges: bin = 1 + |{e ∈ edges : v > e}|
    * (ascending edges ⇒ equi-depth bin ids 1..nBins; strict `>` matches
    * PERCENTILE_CONT boundary semantics on both engines). The edges side
    * broadcasts; the bucket is a row-local filter-HOF — the fact is never
    * shuffled. Rows whose group has no edges row are left un-binned
    * (null), surfacing unseen-at-fit-time groups instead of guessing. */
  def applyBins(fact: DataFrame, bins: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    fact.join(broadcast(bins), Seq(groupCol), "left")
      .withColumn("bin",
        when(col("edges").isNotNull,
          lit(1) + size(filter(col("edges"), e => col(valueCol) > e)))
          .cast("int"))
      .drop("edges")
  }
}
