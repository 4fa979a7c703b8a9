package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Streaming twins for the embedding/ANN lifecycle — the live counterpart
  * of the x65/x126/x127 batch axis.
  *
  * The operational read is INDEX SKEW: an IVF deployment watches its cell
  * census continuously because a drifting upstream embedding model piles
  * new vectors into few cells long before the next refresh — exactly the
  * staleness x127's refresh canary quantifies at release time. The census
  * here IS the batch fold (SimilarityQueries.cellCensusStatsOf, shared
  * verbatim): arriving vectors assign to the pinned index's cells with the
  * same row-local literal-centroid codegen argmin x65 plans, then fold
  * into per-(cell, label) counts — a pure mergeable monoid whose state is
  * ≤ nCells×|labels| rows BY CONSTRUCTION. Update mode; counts are
  * monotone per key, so the latest emission per key is the current census.
  * No watermark — census state is index-lifetime, bounded by design (the
  * same lifetime argument as DocStream's datasheet twin). The
  * dedup/manifest family's no-streaming-form argument (global transitive
  * closure) does NOT apply here: assignment is row-local and the fold is a
  * monoid, so the streaming form is exact. */
object EmbStream {

  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-source form: watch a directory of embedding parquet drops. */
  def readEmbeddings(spark: SparkSession, dir: String,
                     maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Continuously-maintained IVF cell census (the STREAMING twin of x65's
    * rollup): per (cell, label) vector counts over everything that has
    * arrived. Consumers derive x65's n_vecs/purity/majority from the cells
    * and alert on cell-share drift. */
  def cellCensusUpdates(emb: DataFrame): DataFrame =
    graft.queries.SimilarityQueries.cellCensusStatsOf(emb)

  /** Continuously-maintained per-cell OUTLIER census (the STREAMING twin
    * of x145's geometry read, completing the live index-health pair:
    * [[cellCensusUpdates]] watches cell SKEW, this watches cell QUALITY):
    * arriving vectors assign-and-score against the pinned centroids with
    * x145's one fused row-local expression, then fold into per-cell
    * (n_vecs, offset-cosine sum, min, under-τ count) — every component a
    * monoid (counts/sums add, min folds), so the state store holds
    * ≤ nCells rows and the streaming fold is EXACT
    * (SimilarityQueries.outlierStatsOf, shared verbatim). Update mode;
    * n_vecs is monotone per cell, so the latest emission per cell is the
    * current census; consumers derive mean_cos_ppm/outlier_ppm exactly as
    * batch x145 does. A climbing outlier share in live traffic is the
    * embedding-drift alarm that fires BETWEEN x127 refresh canaries. */
  def outlierCensusUpdates(emb: DataFrame): DataFrame =
    graft.queries.SimilarityQueries.outlierStatsOf(emb)
}
