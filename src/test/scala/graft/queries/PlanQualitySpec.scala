package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Plan-quality regression guards: the physical-plan properties PLANS.md
  * documents must keep holding — a correctness-preserving change that
  * silently drops a pushdown or broadcast would pass every value test and
  * still be a scale bug. */
class PlanQualitySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: QueryDef): String =
    q.run(spark, dir).queryExecution.executedPlan.toString

  test("q01: filter pushed to the parquet scan, schema pruned") {
    val plan = planOf(CoreQueries.q01)
    plan should include("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]")
    plan should include("ReadSchema")
    plan should not include "l_shipdate" // untouched column must not be read
  }

  test("q03: both dimension joins are broadcast (fact never shuffles for dims)") {
    val plan = planOf(CoreQueries.q03)
    "BroadcastHashJoin".r.findAllIn(plan).size shouldBe 2
    plan should not include "SortMergeJoin"
  }

  test("q16: top-k avoids a global sort (TakeOrderedAndProject)") {
    planOf(CoreQueries.q16) should include("TakeOrderedAndProject")
  }

  test("q13: the lag window costs exactly one exchange before the output sort") {
    val plan = planOf(CoreQueries.q13)
    // one shuffle for the window partition + the final rangepartitioning sort
    "Exchange".r.findAllIn(plan).size should be <= 2
    plan should include("Window")
  }

  test("q08: aggregation is partial-final (map-side combine before shuffle)") {
    val plan = planOf(CoreQueries.q08)
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("x12: corpus side is broadcast-nested-loop; per-partition top-k prunes early") {
    val plan = planOf(SimilarityQueries.simBruteTopk)
    plan should include("BroadcastNestedLoopJoin")
    plan should include("WindowGroupLimit")
  }

  test("x27: per-doc top-k terms prune early (WindowGroupLimit, partial-final aggs)") {
    // registry: x27_text_tfidf
    val plan = planOf(TextQueries.textTfidf)
    plan should include("WindowGroupLimit") // rk<=3 pushed into the window sort
    "HashAggregate".r.findAllIn(plan).size should be >= 2 // map-side combine
  }

  test("x56: shard layout is one exchange + one window, no global sort before it") {
    val plan = planOf(TextQueries.corpusShards)
    plan should include("Window")
    // one shuffle for the shard partition + the final output sort only
    "Exchange".r.findAllIn(plan).size should be <= 2
  }

  test("x57: the datasheet rollup reads the corpus ONCE (Expand grouping sets)") {
    val plan = planOf(TextQueries.datasheetRollup)
    plan should include("Expand") // both granularities from one scan
    "Scan parquet".r.findAllIn(plan).size shouldBe 1
    "HashAggregate".r.findAllIn(plan).size should be >= 2 // partial-final
  }

  test("x28: the as-of enrichment plans NO join node (union+window, one shuffle)") {
    val plan = planOf(EventsQueries.asofClickView)
    plan should not include "Join" // the whole point: no inequality-join blowup
    plan should include("Window")
    "Exchange".r.findAllIn(plan).size should be <= 2 // window partition + output sort
  }

  test("x29: the range join is a bucket EQUI-join — no nested-loop scan") {
    // registry: x29_ev_value_bands
    val plan = planOf(EventsQueries.valueBands)
    plan should not include "BroadcastNestedLoopJoin" // what naive BETWEEN would plan
    plan should not include "CartesianProduct"
    plan should include("Join") // and it IS a real (hash/sort-merge) equi-join
  }

  test("x32: funnel stages share one window exchange — no fact self-joins") {
    val plan = planOf(EventsQueries.funnel)
    plan should not include "Join" // three chained window mins, zero joins
    // window partition + distinct + output sort — NOT one exchange per stage
    "Exchange".r.findAllIn(plan).size should be <= 3
  }

  test("registry-wide: no query plans a CartesianProduct or a UDF eval node") {
    graft.SparkEntry.defs.foreach { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      withClue(s"${q.name}: ") {
        plan should not include "CartesianProduct"
        plan should not include "BatchEvalPython"
        plan should not include "ScalaUDF"
      }
    }
  }

  test("x01/x02: the exact-dedup exchange partitions on the 16-byte derived key, not the payload") {
    // registry: x02_dedup_bow
    // registry: x01_dedup_exact
    Seq(TextQueries.dedupExact -> "text", TextQueries.dedupBow -> "bow_key").foreach {
      case (q, payload) =>
        val plan = planOf(q)
        // exactly one hash exchange (plus the output range sort), and its
        // partitioning expressions are the derived (__h, __len) — the
        // document-sized string must never be the shuffle key at 100 TB
        val hashParts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSeq
        withClue(s"${q.name}: ") {
          hashParts should have size 1
          hashParts.head should include("__h")
          hashParts.head should include("__len")
          hashParts.head should not include payload
        }
    }
  }

  test("x51: the exact-rep window reuses the 16-byte repartition (no text-keyed exchange)") {
    val plan = planOf(TextQueries.dedupApply)
    "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(_.contains("text")).toSeq shouldBe empty
  }

  test("x64: the quality gate is one scan with zero hash exchanges (row-local rules)") {
    val plan = planOf(TextQueries.textQualityGate)
    // every rule is a codegen'd HOF over one split — the only exchange the
    // plan may carry is the presentation sort's rangepartitioning
    "hashpartitioning".r.findAllIn(plan).size shouldBe 0
    "Exchange".r.findAllIn(plan).size should be <= 1
  }

  test("x65: no exchange carries the embedding payload (assignment is a map pass)") {
    val plan = planOf(SimilarityQueries.simIvfCells)
    // the rollup shuffles only (cell, label) counts; the vectors must be
    // consumed by the row-local argmin before any exchange
    "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(_.contains("embedding")).toSeq shouldBe empty
  }

  test("x70: bloom probe is row-local; no exchange ever carries the BoW key") {
    val plan = planOf(TextQueries.bloomDedup)
    // the bitmap attaches as a 1-row broadcast (BNLJ), the verify and flag
    // joins are broadcast hash joins — the corpus side must never
    // sort-merge, and no shuffle may partition on the document-sized key
    plan should include("BroadcastNestedLoopJoin")
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(_.contains("bk")).toSeq shouldBe empty
  }

  test("x52: record linkage verifies over band-join candidates, never all-pairs") {
    // registry: x52_record_linkage
    val plan = planOf(TextQueries.recordLinkage)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("x53: the row-level quota window is bucket-split, not per-source serial") {
    // registry: x53_text_mixture
    val plan = planOf(TextQueries.textMixture)
    // the full-width exchange must carry the bucket prefix alongside the
    // group key — hashpartitioning(source) alone would serialize a 100 TB
    // source through one running-sum task
    val parts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    parts.filter(p => p.contains("__bkt") && p.contains("source")) should not be empty
    plan should include("BroadcastHashJoin") // bucket offsets join back broadcast
    plan should not include "SortMergeJoin"
  }

  test("x54: the packing offset window is bucket-split, not per-source serial") {
    val plan = planOf(TextQueries.textPack)
    // same contract as x53: the running-offset exchange carries the bucket
    // prefix with the group key, so concatenation order never serializes
    val parts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    parts.filter(p => p.contains("__bkt") && p.contains("source")) should not be empty
    plan should include("BroadcastHashJoin") // bucket offsets join back broadcast
    plan should not include "SortMergeJoin"
  }

  test("x20: batch side broadcasts; corpus side never shuffles for the pair join") {
    // registry: x20_dedup_embedding
    val plan = planOf(SimilarityQueries.dedupEmbedding)
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
  }

  test("x21: candidate generation is a band-bucket equi-join, never all-pairs") {
    val plan = planOf(SimilarityQueries.dedupEmbLsh)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("x68: IVF-PQ probe and rerank are equi-joins, never all-pairs") {
    val plan = planOf(SimilarityQueries.simPqTopk)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("x67: SemDeDup pairs come from a cell equi-join, never all-pairs") {
    val plan = planOf(SimilarityQueries.semanticDedup)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("x37: incremental probe is a band-bucket equi-join, never all-pairs") {
    val plan = planOf(TextQueries.dedupIncremental)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("x38: rolling activity costs one exchange before the output sort") {
    val plan = planOf(EventsQueries.rollingActivity)
    plan should include("Window")
    // one shuffle for the window partition + the final rangepartitioning sort
    "Exchange".r.findAllIn(plan).size should be <= 2
  }

  test("x39: benchmark side broadcasts; corpus never shuffles for contamination scan") {
    // registry: x39_sim_contamination
    val plan = planOf(SimilarityQueries.simContamination)
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
  }

  test("x40: vocabulary joins back by broadcast (token fact side never shuffles for it)") {
    // registry: x40_text_freq_score
    val plan = planOf(TextQueries.textFreqScore)
    plan should include("BroadcastHashJoin")
  }

  test("x44/x45: per-group stats broadcast back — the fact side never shuffles for the transform") {
    // registry: x44_ev_winsorize
    planOf(EventsQueries.winsorize) should include("BroadcastHashJoin")
    // registry: x45_ev_zscore
    planOf(EventsQueries.zscore) should include("BroadcastHashJoin")
  }

  test("x48: resample grid + fill plan no self-joins beyond the grid-obs merge") {
    val plan = planOf(EventsQueries.resampleFfill)
    plan should include("Window")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("x19: frame sampling is pure Catalyst — no UDF / serialization boundary") {
    // registry: x19_media_frames
    val plan = planOf(MediaQueries.mediaFrames)
    plan should not include "BatchEvalPython"
    plan should not include "UDF"
  }

  test("KW mid-ranks: no unpartitioned window (single-task rank is a driver-killer)") {
    import spark.implicits._
    val counts = Seq((1.0, 3L), (2.0, 2L), (5.0, 1L)).toDF("v", "c")
    graft.ml.StatTests.withValueRanks(counts, "v", "c") { ranks =>
      val plan = ranks.queryExecution.executedPlan.toString
      plan should include("Window") // the prefix-sum window exists...
      // ...but every windowspecdefinition is partitioned by the range
      // partition id (first argument `pid#`), never global.
      "windowspecdefinition\\(([a-zA-Z_]+)#".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet shouldBe Set("pid")
      // and the mid-ranks are right: 3×1.0 → ranks 1..3 → 2.0;
      // 2×2.0 → ranks 4,5 → 4.5; 1×5.0 → rank 6.
      val got = ranks.orderBy("v").collect().map(r =>
        (r.getDouble(0), r.getAs[Double]("rk"),
          r.getAs[Long]("rank_offset") + r.getAs[Long]("cum_before"),
          r.getAs[Long]("c")))
      got.map(g => (g._1, g._2)).toSeq shouldBe Seq((1.0, 2.0), (2.0, 4.5), (5.0, 6.0))
      // the exposed integer components reassemble the mid-rank exactly
      // (rk = offset + cum_before + 1 + (c-1)/2 — the x131 BIGINT contract)
      got.foreach { case (_, rk, off, c) =>
        rk shouldBe off + 1.0 + (c - 1) / 2.0
      }
    }
  }

  test("x60: holder counts via partial-final groupBy + equi-join, never a per-hash window") {
    val plan = planOf(TextQueries.substringDup)
    // a `count over (partition by h)` would funnel every occurrence of a
    // boilerplate-hot window through one task with no map-side relief; the
    // groupBy gets partial aggregation and the join back is AQE-splittable
    plan should not include "windowspecdefinition(h#"
    plan should include("partial_count")
    plan should not include "CartesianProduct"
    // window strings never exist in the plan: only the 8-byte hash column
    plan should not include "substring"
    // explode → groupBy(h) → join(h) → groupBy(doc_id) → output sort
    "Exchange".r.findAllIn(plan).size should be <= 4
  }

  test("x74: the corpus snapshot never shuffles for the merge (broadcast anti join)") {
    val plan = planOf(TextQueries.snapshotMerge)
    plan should include("BroadcastHashJoin")
    plan should include("LeftAnti")
    plan should not include "SortMergeJoin"
    // the last-writer-wins window runs over the batch-sized changeset; the
    // only exchanges are the changeset's window partition + the output sort
    plan should include("Window")
  }

  test("x75: interval overlap is a bucketed equi-join — no nested-loop, no distinct") {
    // registry: x75_ev_interval_overlap
    val plan = planOf(EventsQueries.intervalOverlap)
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    plan should include("__bucket")
    // dedup is the row-local first-common-bucket filter, not a re-shuffling
    // distinct of the join output
    plan should not include "HashAggregate(keys=[a_user"
  }

  test("x76: the fact table is scanned once and never sorted for the skew report") {
    // registry: x76_ev_key_skew
    val plan = planOf(EventsQueries.keySkewReport)
    // one partial-final count over the fact; every later stage runs on the
    // keys-sized counts table
    plan should include("partial_count")
    plan should not include "SortMergeJoin"
  }

  test("x77: both split windows share one exchange on user_id") {
    // registry: x77_ev_temporal_split
    val plan = planOf(EventsQueries.temporalSplit)
    // window partition exchange + output range sort, nothing else
    "Exchange".r.findAllIn(plan).size should be <= 2
    plan should include("Window")
  }

  test("x78: attribution rides ONE user_id exchange — no (user, session) re-shuffle") {
    val plan = planOf(EventsQueries.attribution)
    // the naive plan re-partitions by (user_id, session_id) for the
    // first-view window; the running struct-max trick keeps everything on
    // the x16 session exchange. Window partition + output sort only.
    "Exchange".r.findAllIn(plan).size should be <= 2
    // no exchange keys on the derived session_id (that's the naive plan)
    "hashpartitioning\\([^)]*session_id".r.findFirstIn(plan) shouldBe None
    plan should include("Window")
  }

  test("x79: retention collapses the fact before any window or join") {
    val plan = planOf(EventsQueries.retentionCohorts)
    // distinct (partial-final) → cohort window over users×weeks → final
    // partial-final count → output sort; the raw fact shuffles once, and
    // map-side combined at that
    plan should include("partial_")
    plan should not include "SortMergeJoin"
    "Exchange".r.findAllIn(plan).size should be <= 4
  }

  test("x80: sparse cosine pairs via posting equi-joins, never all-pairs") {
    val plan = planOf(TextQueries.sparseCosine)
    plan should not include "CartesianProduct"
    // nested-loop appears ONLY as the single-row corpus-count attach (the
    // x27 `crossJoin(broadcast(n))` shape); the doc-pair join itself must
    // be an EQUI-join keyed on the posting term
    "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[term".r
      .findFirstIn(plan) should not be None
    // tf/df aggregations are map-side combined before their shuffles
    plan should include("partial_count")
  }

  test("x81: release diff is one full-outer merge join — neither manifest broadcasts") {
    // registry: x81_release_diff
    val plan = planOf(TextQueries.releaseDiff)
    plan should include("FullOuter")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("x82: MAD stats broadcast back — the fact never sort-merge-joins") {
    val plan = planOf(EventsQueries.madOutliers)
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("x83: transition windows share x16's exchange; normalization is post-agg") {
    // registry: x83_ev_transitions
    val plan = planOf(EventsQueries.sessionTransitions)
    // fact window exchange + partial-final groupBy + tiny prev_type window
    // + output sort — and the lead/lag windows never add a second fact
    // exchange (no (user, session) partitioning)
    "hashpartitioning\\([^)]*session_id".r.findFirstIn(plan) shouldBe None
    "Exchange".r.findAllIn(plan).size should be <= 4
    plan should include("partial_count")
  }

  test("x84: phash candidates via (band, value) equi-join, never all-pairs") {
    // registry: x84_media_phash_dedup
    val plan = planOf(graft.queries.MediaQueries.mediaPhashDedup)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("x85: MIH probe keys equi-join the exact band table — no all-pairs") {
    // registry: x85_media_phash_mih
    val plan = planOf(graft.queries.MediaQueries.mediaPhashMih)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // the probe side's constant 137-key enumeration is a generator, not a join
    plan should include("Generate")
  }

  test("x86: serve-time binning broadcasts the edges — the fact never shuffles") {
    // registry: x86_ev_feature_bins
    val plan = planOf(EventsQueries.featureBins)
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("x94: priority sample prunes inside the window sort (WindowGroupLimit)") {
    // registry: x94_text_weighted_sample
    val plan = planOf(TextQueries.weightedSample)
    plan should include("WindowGroupLimit") // rk<=8 pushed into the sort
    plan should not include "Join"
    "Exchange".r.findAllIn(plan).size should be <= 2 // source window + output sort
  }

  test("x90: recall audit — truth via K-row broadcast, caught via equi semi-join") {
    // registry: x90_dedup_recall_audit
    val plan = planOf(TextQueries.dedupRecallAudit)
    plan should not include "CartesianProduct"
    // the caught check is a canonical-orientation (lo, hi) EQUI semi-join,
    // never an OR-condition nested loop over the candidate table
    plan should include("LeftSemi")
    plan should include("TakeOrderedAndProject") // the md5-order sample prune
  }

  test("x91: hashed features are row-local — the only exchange is the output sort") {
    val plan = planOf(EventsQueries.featureHashing)
    "Exchange".r.findAllIn(plan).size should be <= 1
    plan should not include "Join"
    plan should include("Generate") // the feature explode
  }

  test("x92/x93: rank and lag features ride one window exchange each") {
    // registry: x93_ev_lag_features
    // registry: x92_ev_percentile_rank
    for (q <- Seq(EventsQueries.percentileRank, EventsQueries.lagFeatures)) {
      val plan = planOf(q)
      withClue(q.name + ": ") {
        "Exchange".r.findAllIn(plan).size should be <= 2 // window + output sort
        plan should include("Window")
        plan should not include "Join"
      }
    }
  }

  test("x89: A/B test is one partial-final pass; z math runs on one row") {
    // registry: x89_ev_ab_test
    val plan = planOf(EventsQueries.abTest)
    plan should include("partial_")
    plan should not include "SortMergeJoin"
    "Exchange".r.findAllIn(plan).size should be <= 2 // user groupBy + global agg
  }

  test("x88: drift binning broadcasts edges; the fact never sort-merge-joins") {
    // registry: x88_ev_drift
    val plan = planOf(EventsQueries.driftReport)
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("x95: the cube is ONE scan through an Expand with partial aggregation") {
    val plan = planOf(EventsQueries.cubeDatasheet)
    plan should include("Expand")
    plan should include("partial_")
    // one events scan feeds all four grouping sets — a per-granularity
    // re-scan would show up as multiple parquet reads
    "FileScan parquet".r.findAllIn(plan).size shouldBe 1
    plan should not include "Join"
  }

  test("x96: triangle closure is equi-joins only — no all-pairs anywhere") {
    val plan = planOf(TextQueries.dupTriangles)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // the wedge-order filter (v ≺ w in degree order) must sit ABOVE an
    // equi-join on the shared wedge vertex, not turn the join theta
    plan should include("SortMergeJoin") // corpus-scale posture under AQE off
  }

  test("x22: both sketch aggs are partial-final; the 5-row frames join by broadcast") {
    val plan = planOf(EventsQueries.approxStats)
    plan should include("partial_")
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("x97: moments are one partial-final pass; corr math is post-agg") {
    val plan = planOf(EventsQueries.corrReport)
    plan should include("partial_")
    plan should not include "Join"
    "Exchange".r.findAllIn(plan).size should be <= 2 // type groupBy + output sort
    "FileScan parquet".r.findAllIn(plan).size shouldBe 1
  }

  test("x98: basket pairing is an equi-join on the basket key; totals attach by broadcast") {
    // registry: x98_ev_cooccurrence
    val plan = planOf(EventsQueries.cooccurrence)
    plan should not include "CartesianProduct"
    // the 1-row n_baskets attach is the only nested-loop — broadcast by
    // construction, never a shuffle
    plan should include("BroadcastNestedLoopJoin")
    plan should include("BroadcastHashJoin") // the |types|-row ca attaches
  }

  test("x99: the corpus is scanned only inside the word-count checkpoint; iterations are vocab-sized") {
    val plan = planOf(TextQueries.bpeMerges)
    // every stage reads a checkpointed boundary (vocab / 1-row best): a
    // parquet scan in the FINAL plan would mean an iteration re-reads the
    // corpus
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should not include "CartesianProduct"
  }

  test("x103: encode is one corpus scan, merges attach by broadcast, zero corpus-side shuffle") {
    val plan = planOf(TextQueries.bpeEncode)
    // the learning stages sit behind checkpoints (ExistingRDD); the ONLY
    // parquet scan in the final plan is the corpus application pass
    "FileScan parquet".r.findAllIn(plan).size shouldBe 1
    plan should not include "CartesianProduct"
    plan should include("BroadcastNestedLoopJoin") // the 1-row merge table
    plan should not include "SortMergeJoin" // encode never shuffles the corpus to join
    // BroadcastExchange (the merge table) is fine; SHUFFLE exchanges must be
    // the presentation sort only
    "Exchange (range|hash)partitioning".r.findAllIn(plan).size should be <= 1
  }

  test("x104: the shard rollup rides the proven dup chain — equi-joins only, partial-final aggs") {
    // registry: x104_shard_dup_rate
    val plan = planOf(TextQueries.shardDupRate)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("partial_") // cluster sizing + shard rollup combine map-side
  }

  test("x105: compression datasheet is one corpus scan + one partial-final agg; merges broadcast") {
    // registry: x105_bpe_compression
    val plan = planOf(TextQueries.bpeCompression)
    "FileScan parquet".r.findAllIn(plan).size shouldBe 1 // learning behind checkpoints
    plan should include("BroadcastNestedLoopJoin") // the 1-row merge table
    plan should not include "SortMergeJoin"
    plan should include("partial_")
    "Exchange (range|hash)partitioning".r.findAllIn(plan).size should be <= 2 // agg + sort
  }

  test("x106: PII scan/redact is fully row-local — one scan, no join, presentation sort only") {
    val plan = planOf(TextQueries.piiRedact)
    "FileScan parquet".r.findAllIn(plan).size shouldBe 1
    plan should not include "Join"
    "Exchange".r.findAllIn(plan).size should be <= 1
  }

  test("x107: keep-best selection rides the chain's cluster key — windows, equi-joins, no cartesian") {
    // registry: x107_dedup_keep_best
    val plan = planOf(TextQueries.dedupKeepBest)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("Window")
  }

  test("x108: the policy switch costs one window + one attribute join over x59's plan, nothing else") {
    val p59 = planOf(TextQueries.releaseManifest)
    val p108 = planOf(TextQueries.releaseManifestKeepBest)
    p108 should not include "CartesianProduct"
    p108 should not include "BroadcastNestedLoopJoin"
    p108 should include("Window") // the keep-best row_number
    // the extra cost over keep-min-id is bounded: the n_chars attribute
    // join's exchanges, nothing structural
    def nEx(p: String) = "Exchange".r.findAllIn(p).size
    nEx(p108) should be <= (nEx(p59) + 3)
  }

  test("x134: quota cut and pack tiling share ONE bucket-split prefix sum; quotas broadcast") {
    // registry: x134_release_pack_bridge
    val plan = planOf(TextQueries.releasePackBridge)
    // everything downstream of the survivor checkpoint is visible here:
    // ONE PrefixQuota pass plans exactly two (…, __bkt) exchanges — the
    // bucket-totals partial-final aggregate and the bucket-local window.
    // A SECOND runningBefore for packing (instead of riding the quota
    // cut's cum_before — the single-plan claim) would double that.
    val hashParts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
    hashParts.count(_.contains("__bkt")) shouldBe 2
    // and the full-width window exchange is bucket-split, never per-source
    // serial (the x53 pin, inherited)
    hashParts.filter(p => p.contains("__bkt") && p.contains("source")) should not be empty
    // the per-source quota table attaches as a broadcast, never a shuffle
    // of the survivor rows toward a sources-sized frame
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    // the 1-row totals attach (budget + Σ√m, the x128/x129 crossJoin
    // pattern) lives behind the quota'd-survivor checkpoint, computed
    // exactly once — the visible plan must carry NO nested-loop node
    plan should not include "BroadcastNestedLoopJoin"
    // no exchange downstream of the checkpoints ever keys on the payload
    hashParts.filter(_.contains("text")) shouldBe empty
  }

  test("x110: one corpus scan behind the checkpoint; vocab is TakeOrdered + broadcast") {
    // registry: x110_vocab_coverage
    val plan = planOf(TextQueries.vocabCoverage)
    // the corpus scan + explode lives inside the checkpointed (source, tok)
    // count (ExistingRDD); vocab selection must be a per-partition top-k
    // (TakeOrderedAndProject, never a global sort) and must join back
    // broadcast — the 16-row vocab never drives a shuffle
    plan should not include "Scan parquet"
    plan should include("ExistingRDD")
    plan should include("TakeOrderedAndProject")
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("x111: one corpus scan behind the checkpoint; chunk-df join is an equi-join") {
    val plan = planOf(TextQueries.boilerStrip)
    // the scan + chunk explode is checkpointed once (two consumers: the
    // document-frequency count and the reassembly join); candidate pairing
    // is always keyed (source, chunk) — never all-pairs
    plan should not include "Scan parquet"
    plan should include("ExistingRDD")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("x112: the span explode rides x54's bucket-split offset plan") {
    val plan = planOf(TextQueries.packSpans)
    // same contract as x54: the running-offset exchange carries the bucket
    // prefix with the group key, so no source serializes through one task;
    // the per-pack explode itself is row-local (Generate, no new exchange)
    val parts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    parts.filter(p => p.contains("__bkt") && p.contains("source")) should not be empty
    plan should include("BroadcastHashJoin") // bucket offsets join back broadcast
    plan should include("Generate")
    plan should not include "SortMergeJoin"
  }

  test("x109: drift math consumes the checkpointed label-sized aggregates — no corpus rescan") {
    // registry: x109_emb_label_drift
    val plan = planOf(SimilarityQueries.embLabelDrift)
    plan should not include "CartesianProduct"
    // the corpus scan + explode lives inside the two checkpointed
    // aggregates (surfacing as ExistingRDD); the visible plan must be
    // labels×64-sized arithmetic, never a second parquet read of the
    // wide embedding column
    plan should not include "Scan parquet"
    plan should include("ExistingRDD")
  }

  test("x100: the projection is row-local — one scan, no exchange but the output sort") {
    val plan = planOf(SimilarityQueries.embRandomProjection)
    "FileScan parquet".r.findAllIn(plan).size shouldBe 1
    "Exchange".r.findAllIn(plan).size should be <= 1 // presentation sort only
    plan should not include "Join"
  }

  test("x101: the mass-median crossover rides one window exchange") {
    // registry: x101_mass_median
    val plan = planOf(TextQueries.massMedian)
    "Exchange".r.findAllIn(plan).size should be <= 2 // source window + output sort
    plan should include("Window")
    plan should not include "Join"
    "FileScan parquet".r.findAllIn(plan).size shouldBe 1
  }

  test("x102: the rank cut prunes inside the window sort (WindowGroupLimit)") {
    val plan = planOf(EventsQueries.topkTies)
    plan should include("WindowGroupLimit")
    plan should not include "Join"
  }

  test("x113: stats are partial-final; the batch provenance attaches BROADCAST") {
    // registry: x113_datasheet_merge
    val plan = planOf(TextQueries.datasheetMerge)
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin" // merge + render are sources-sized
    "HashAggregate".r.findAllIn(plan).size should be >= 2 // map-side combine
  }

  test("x114: closed-form span math — NO explode (Generate) where x112 needs one") {
    val plan = planOf(TextQueries.packEfficiency)
    plan should not include "Generate" // the datasheet never materializes spans
    plan should include("Window") // x54's bucket-split prefix sum, unchanged
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("x115: the reference instant attaches by broadcast; ONE partial-final agg on user_id") {
    val plan = planOf(EventsQueries.decayScore)
    plan should include("BroadcastNestedLoopJoin") // 1-row scalar, never a shuffle
    plan should not include "SortMergeJoin"
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("x117: one corpus scan; totals are a window over the aggregated cells") {
    val plan = planOf(TextQueries.langidConfusion)
    "FileScan parquet".r.findAllIn(plan).size shouldBe 1 // no second scan for totals
    plan should include("Window")
    "HashAggregate".r.findAllIn(plan).size should be >= 2 // partial-final cells
    plan should not include "Join"
  }

  test("x126: candidates generated ONCE at max nprobe — no per-rung rescan, no wild cartesian") {
    val plan = planOf(SimilarityQueries.annRecallSweep)
    // exactly five 500-row embedding scans: corpus assignment, query probes,
    // the 1-row n_queries aggregate, and the exact side's corpus + queries —
    // a per-nprobe rescan architecture would add a scan (or a join) per rung
    "FileScan parquet".r.findAllIn(plan).size shouldBe 5
    // ONE cell equi-join builds the candidate set (probes broadcast);
    // the 4-way rung fan-out is a row-local Generate over those candidates
    "BroadcastHashJoin".r.findAllIn(plan).size shouldBe 1
    // exactly three Generates: the probe posexplode, the candidate rung
    // fan-out, and the output spine's rung literal — a rescan would repeat
    "Generate".r.findAllIn(plan).size shouldBe 3
    // the only nested-loop joins are the two BOUNDED broadcasts: the 10-row
    // query set against the corpus (exact side) and the 1-row n_queries
    // scalar against the 4-row spine
    "BroadcastNestedLoopJoin".r.findAllIn(plan).size shouldBe 2
    plan should not include "CartesianProduct"
  }

  test("x127: the sweep chain runs ONCE — the max rides a post-aggregate window, no duplicate subtree") {
    // registry: x127_ann_operating_point
    val plan = planOf(SimilarityQueries.annOperatingPoint)
    // exactly x126's five embedding scans: computing the max via a second
    // aggregation over the sweep LINEAGE would double them to 10
    "FileScan parquet".r.findAllIn(plan).size shouldBe 5
    "BroadcastHashJoin".r.findAllIn(plan).size shouldBe 1 // candidates built once
    "Generate".r.findAllIn(plan).size shouldBe 3          // no per-rung rescan
    plan should not include "CartesianProduct"
  }

  test("x128: the corpus aggregate is computed once; totals attach broadcast") {
    // registry: x128_mixture_temperature
    val plan = planOf(TextQueries.mixtureTemperature)
    // the checkpointed |sources|-row aggregate feeds both consumers — the
    // final plan reads ONLY the checkpoint (x87's stance): zero re-scans
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastNestedLoopJoin") // the 1-row totals frame
    plan should not include "SortMergeJoin"
    plan should not include "Window" // totals are NOT an unpartitioned window
  }

  test("x129: the gate is fused into the one scan; the aggregate computes once; totals broadcast") {
    // registry: x129_gated_mixture
    val plan = planOf(TextQueries.mixtureGated)
    // x128's shape with x64's row-local gate fused in: zero re-scans after
    // the checkpoint, broadcast totals, no join to re-attach the source
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "SortMergeJoin"
    plan should not include "BroadcastHashJoin" // no doc_id re-attach join
    plan should not include "Window"
  }

  test("x130: the gate rides the prefix-sum passes — no doc-keyed re-attach join") {
    // registry: x130_pack_quality
    val plan = planOf(TextQueries.packQuality)
    // exactly PrefixQuota's two passes over the corpus (bucket totals +
    // local windows) and nothing more — a separate gate pass re-attached
    // by doc_id would make it three scans plus a corpus-keyed join
    "FileScan parquet".r.findAllIn(plan).size shouldBe 2
    plan should include("Generate") // the bounded span explode
    plan should include("Window")   // x54's bucket-split prefix sum
    "HashAggregate".r.findAllIn(plan).size should be >= 2 // packs rollup partial-final
    plan should not include "SortMergeJoin"
    // the ONLY join is PrefixQuota's broadcast bucket-base attach on
    // (source, __bkt) — never a doc_id-keyed flags join
    "BroadcastHashJoin".r.findAllIn(plan).size shouldBe 1
    "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(_.contains("doc_id")).toSeq shouldBe empty
  }

  test("x131: rank sums ride the PINNED range-partitioned values table — partitioned window only") {
    // registry: x131_score_auc
    val plan = planOf(TextQueries.scoreAuc)
    // the distinct-value table is materialized by withValueRanks' eager
    // checkpoint (pinning the (pid,row) assignment the driver-frozen
    // offsets were built from): the final plan reads ONLY that RDD
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    // the prefix-sum window partitions on pid — NEVER an unpartitioned
    // window over the (≈corpus-sized) distinct-score table
    plan should include("windowspecdefinition(pid")
    plan should not include "CartesianProduct"
  }

  test("x132: the token shuffle is computed once; the total attaches broadcast") {
    // registry: x132_token_spectrum
    val plan = planOf(TextQueries.tokenSpectrum)
    // the 21-row bucket rollup is checkpointed for its two consumers — the
    // final plan reads ONLY the checkpoint (x87's stance): the expensive
    // token exchange can never run twice for the 1-row grand total
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastNestedLoopJoin") // the 1-row total
    plan should not include "SortMergeJoin"
  }

  test("x135: thresholds attach broadcast; the bigram chain is computed once") {
    // registry: x135_ppl_buckets
    val plan = planOf(TextQueries.pplBuckets)
    // the integer-score table is checkpointed for its two consumers
    // (threshold window + bucket rollup): the final plan reads ONLY the
    // checkpoint — the x62 bigram chain can never run twice
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    // per-lang tertile thresholds come back as a BROADCAST attach (a
    // langs-sized table); the lang window runs on the BOUNDED
    // (lang, score_ppm) count table, never on doc rows
    plan should include("BroadcastHashJoin")
    plan should include("windowspecdefinition(lang")
    // one rangepartitioning only — the output sort; a rank-based tertile
    // would need a second (per-lang global order over every doc)
    "rangepartitioning".r.findAllIn(plan).size shouldBe 1
    plan should not include "CartesianProduct"
  }

  test("x136: purge expansion is broadcast-only; no exchange ever carries the text payload") {
    // registry: x136_contamination_halo
    val plan = planOf(TextQueries.contaminationHalo)
    // the contaminated-rep set and the seed rollup attach as BROADCASTS
    // (both bounded by benchmark size); the doc→rep chain is read from its
    // checkpoint, so the closure never recomputes per consumer
    plan should include("ExistingRDD")
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    // document-sized strings must never key a shuffle (the x51 stance):
    // exact collapse shuffles on the 16-byte (__h, __len) derived key
    "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(_.contains("text")).toSeq shouldBe empty
  }

  test("x137: both phases read the one checkpointed |sources|-row table") {
    // registry: x137_anneal_schedule
    val plan = planOf(TextQueries.annealSchedule)
    // the two corpus passes (flags scan, bigram chain) and every rollup
    // live BEHIND the r0 checkpoint: the final plan is a union of two
    // row-local projections over the pinned |sources|-row table — re-scan
    // or re-join here would mean the schedule recomputes per phase
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("Union")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("x138: one corpus scan, two kernel calls; merge tables attach broadcast") {
    // registry: x138_vocab_migration
    val plan = planOf(TextQueries.vocabMigration)
    // both vocab versions ride the SAME scan as row-local kernel calls —
    // a second FileScan would mean the corpus is read per vocab version
    "FileScan parquet".r.findAllIn(plan).map(_ => 1).sum +
      "ExistingRDD".r.findAllIn(plan).map(_ => 1).sum should be >= 1
    plan should include("graft_bpe_tokens")
    plan should include("BroadcastNestedLoopJoin") // the two 1-row merge tables
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    // exactly one corpus-side FileScan of documents (the learning stages
    // live behind the vocabulary-sized checkpoints)
    "FileScan parquet [^\\n]*documents".r.findAllIn(plan).size should be <= 1
  }

  test("x139: both crossover passes run on the checkpointed bounded count table") {
    // registry: x139_robust_quality
    val plan = planOf(TextQueries.robustQuality)
    // the bigram chain lives behind the (source, score_ppm) count-table
    // checkpoint; the stats pass, the MAD re-key, and the median attach
    // all read that bounded table — no corpus re-scan, medians broadcast
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastHashJoin")
    plan should include("windowspecdefinition(source")
    plan should not include "CartesianProduct"
  }

  test("x140: the global cut is bucket-split — no unpartitioned token window over packs") {
    // registry: x140_anneal_pack_order
    val plan = planOf(TextQueries.annealPackOrder)
    // at 100 TB the packs table is corpus/512 rows: the schedule cut must
    // run through PrefixQuota's bucket-split machinery, never a single
    // unpartitioned running-sum window over every pack (the constant
    // group key folds away, leaving the window partitioned on __bkt —
    // exactly the shape that scales)
    plan should include("windowspecdefinition(__bkt")
    plan should include("hashpartitioning(__bkt")
    // the manifest is checkpointed for its two consumers (budget + cut)
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should not include "CartesianProduct"
  }

  test("x133: pairs are verified once — every tau rung reads the checkpointed pair set") {
    // registry: x133_dedup_threshold_curve
    val plan = planOf(TextQueries.dedupThresholdCurve)
    // the x03 chain + the tau fan-out live behind checkpoints: the final
    // plan re-verifies nothing and re-scans nothing per rung
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastNestedLoopJoin") // 1-row rep count on the 4-row spine
    plan should not include "CartesianProduct"
    // (the rung-spine LEFT joins are 4-row frames either side — AQE turns
    // their static SMJs into broadcasts at runtime, same as x126's spine)
  }

  test("x141: one bigram chain with the source carried through; totals attach broadcast") {
    // registry: x141_doremi_weights
    val plan = planOf(TextQueries.doremiWeights)
    // (source, n_tok) ride the bigram rows — the rollup must not re-join
    // the corpus by doc_id, and the sum_w total attaches as a broadcast
    // 1-row frame, never a shuffle
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
    "HashAggregate".r.findAllIn(plan).size should be >= 2 // map-side combine
  }

  test("x142: pure row-local normalization — no joins, no windows, one rollup") {
    // registry: x142_normalize_fixpoint
    val plan = planOf(TextQueries.normalizeFixpoint)
    // both normalization passes and the idempotence compare are row-local
    // HOFs fused above ONE grouped aggregate (the distinct counts expand
    // inside it); anything join- or window-shaped would be a second
    // corpus pass in disguise
    plan should not include "Join"
    plan should not include "Window"
    plan should include("Expand") // the two count-distinct branches
    "HashAggregate".r.findAllIn(plan).size should be >= 2
    // r18: the normalization is the native codegen kernel, not the
    // interpreted HOF chain (r17 verdict item 3) — both passes
    "graft_norm_text".r.findAllIn(plan).size should be >= 2
    plan should not include "filter(lambda" // no interpreted HOF remains
  }

  test("x143: the L ladder explodes row-locally — no join against the length table") {
    // registry: x143_truncation_waste
    val plan = planOf(TextQueries.truncationWaste)
    plan should not include "Join"
    plan should not include "Window"
    plan should include("Generate explode") // the 3-element literal ladder
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("x144: ownership counted by a bigram-bounded window, not a corpus join") {
    // registry: x144_ngram_novelty
    val plan = planOf(TextQueries.ngramNovelty)
    // n_sources comes from a window over the (source, bigram) COUNT table
    // partitioned by the bigram — a group is ≤ |sources| rows by
    // construction — never from joining the corpus-sized bigram rows back
    // to themselves
    plan should include("windowspecdefinition(w1")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    "HashAggregate".r.findAllIn(plan).size should be >= 4 // both rollups partial-final
  }

  test("x145: assignment and cosine fused in one row-local map — no centroid join") {
    // registry: x145_ann_outlier_census
    val plan = planOf(SimilarityQueries.annOutlierCensus)
    // the pinned centroids ride the plan as literals inside one sorted-
    // struct expression: the only corpus-sized work is the map pass into
    // a ≤ nCells-row aggregate — any Join here means the index artifact
    // leaked out of the expression
    plan should not include "Join"
    plan should not include "CartesianProduct"
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("x146: one corpus scan — the water-filling runs entirely on the bounded rung table") {
    // registry: x146_repeat_decay
    val plan = planOf(TextQueries.repeatDecay)
    // the supply table is checkpointed; the rungs, the λ pick, and the
    // final pricing read it — a second FileScan would mean the corpus is
    // being re-tokenized for a |sources|-row computation
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastNestedLoopJoin") // budget/λ attach broadcast
    plan should not include "CartesianProduct"
  }

  test("x147: the CC chain stays checkpointed; the gate attaches by equi-join, never cartesian") {
    // registry: x147_dup_quality_link
    val plan = planOf(TextQueries.dupQualityLink)
    plan should include("ExistingRDD") // the x51 chain's checkpointed labels
    plan should not include "CartesianProduct"
    "HashAggregate".r.findAllIn(plan).size should be >= 2
    // r21: the exact-rep window moved behind the fused erep checkpoint
    // (chainAndErepOf), so the registry plan can no longer show it — pin
    // the stage frame directly: ONE (hash, len)-keyed exchange, and the
    // window keys on it (dup-group bounded, never an unpartitioned
    // corpus window)
    val erep = TextQueries.erepFrameOf(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"))
    val erepPlan = erep.queryExecution.executedPlan.toString
    erepPlan should include("windowspecdefinition(__h")
    "Exchange hashpartitioning\\(__h".r.findAllIn(erepPlan).size shouldBe 1
  }

  test("x148: both statistics run on the bounded (bucket, score) count table") {
    // registry: x148_score_length_bias
    val plan = planOf(TextQueries.scoreLengthBias)
    // the bigram chain lives behind the bucketed-doc checkpoint; the
    // median crossover windows partition on the bucket over the COUNT
    // table (≤ 21·(1e6+1) rows at any corpus size), never corpus rows
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("windowspecdefinition(bucket")
    plan should not include "CartesianProduct"
  }

  test("x149: both models come from the ONE checkpointed pair table; only the probe re-explodes") {
    // registry: x149_dsir_importance
    val plan = planOf(TextQueries.dsirImportance)
    // r19 collapse (r18 verdict item 1): the corpus+target pair counts are
    // ONE checkpointed exchange (ExistingRDD here); the probe rows are the
    // only explode left in the final plan; the merged ctx table attaches
    // via the counted guardedBroadcast — never a cartesian
    "Generate explode".r.findAllIn(plan).size shouldBe 1
    plan should include("ExistingRDD")
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
  }

  test("x150: vectors never join vectors — the centroid table attaches broadcast") {
    // registry: x150_label_centroid_census
    val plan = planOf(SimilarityQueries.labelCentroidCensus)
    // one posexplode (Generate) feeds the whole pipeline (the checkpointed
    // bounded centroid tables split off their consumers); the per-vec dot
    // joins the BROADCAST (|labels|·64)-row centroid table
    plan should include("Generate posexplode")
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("x151: the gate runs row-local in one scan; the melt is over the bounded aggregate") {
    // registry: x151_gate_ablation
    val plan = planOf(TextQueries.gateAblation)
    plan should not include "Join"   // no doc-keyed re-attach anywhere
    plan should not include "Window"
    // one partial+final aggregate pair per union branch, all reading the
    // same |sources|-row aggregate — never a second corpus scan per rule
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("x152: one corpus scan serves all three budgets (the supply table is checkpointed)") {
    // registry: x152_repeat_budget_sweep
    val plan = planOf(TextQueries.repeatBudgetSweep)
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0 // behind the checkpoint
    plan should include("ExistingRDD")
    plan should include("BroadcastNestedLoopJoin") // budget/λ attach broadcast
    plan should not include "CartesianProduct"
  }

  test("x153: every model AND the rollup run on the one checkpointed pair table — zero explodes downstream") {
    // registry: x153_source_lm_divergence
    val plan = planOf(TextQueries.sourceLmDivergence)
    // r19 collapse (r18 verdict item 1): the (source, w1, w2) pair count is
    // the ONE corpus-scale exchange; the instance-weighted rollup is the
    // s2-weighted rollup over that bounded table, so the final plan holds
    // NO Generate at all — the explode lives entirely inside the
    // checkpoint subtree
    "Generate explode".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastHashJoin") // the guarded ctx attach
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("x154: one scan behind the checkpoint computes both masses; totals attach broadcast") {
    // registry: x154_token_accounting
    val plan = planOf(TextQueries.tokenAccounting)
    // the per-source (ws, bpe) mass table is checkpointed — the final
    // plan reads ONLY it; the Σ√ totals land as a broadcast 1-row frame
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
  }

  test("x155: the eval-suite gram side rides the counted guard; the sources×suites cross is a bounded broadcast") {
    // registry: x155_contamination_by_suite
    val plan = planOf(TextQueries.contaminationBySuite)
    // the test-gram side goes through guardedBroadcast (r18 advice: the
    // hash-ladder split grows with the corpus, so the hint is COUNTED, not
    // unconditional) — under the threshold at fixture scale it broadcasts,
    // and the checkpointed frame shows up as ExistingRDD
    plan should include("BroadcastHashJoin")        // train grams ⋈ guarded test grams
    plan should include("ExistingRDD")
    plan should include("BroadcastNestedLoopJoin")  // |sources| × 3 suites
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("x156: the chain is checkpointed; survivors attach by equi-joins only") {
    // registry: x156_dedup_survivorship
    val plan = planOf(TextQueries.dedupSurvivorship)
    plan should include("ExistingRDD") // the checkpointed (doc, rep, source, pass) frame
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin" // every join is keyed
  }

  test("x157: one corpus aggregate; the κ table is a bounded union over the checkpointed 1-row frame") {
    // registry: x157_gate_rule_agreement
    val plan = planOf(TextQueries.gateRuleAgreement)
    // all 4 marginals + 12 joint cells ride ONE partial-final aggregate
    // (inside the checkpoint); the 6 pair rows are projections over the
    // 1-row ExistingRDD — no join, no window, no second corpus scan
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("Union")
    plan should not include "Join"
    plan should not include "Window"
  }

  test("x158: flagged docs via the x35 gram join; weights run on the checkpointed |sources| table") {
    // registry: x158_decon_mixture_shift
    val plan = planOf(TextQueries.deconMixtureShift)
    // the final plan reads ONLY the per-source checkpoint plus its own
    // 1-row Σ√ totals (broadcast nested loop); the corpus-scale gram work
    // lives inside the checkpoint subtree
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("x159: vectors never join vectors — every centroid table attaches broadcast") {
    // registry: x159_label_confusion_census
    val plan = planOf(SimilarityQueries.labelConfusionCensus)
    // the all-centroids probe joins the BROADCAST (|labels|·64)-row
    // centroid frame (the documented |vecs|·|labels| fan-out) INSIDE the
    // miss-table checkpoint; the final plan reads only the checkpointed
    // RDDs and re-attaches the |labels|-row rollups broadcast — no SMJ,
    // no second embeddings scan
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }

  test("x87: the fact is scanned once; encoding math runs on the cells table") {
    val plan = planOf(CoreQueries.x87)
    // the localCheckpoint splits the three cells consumers off the fact:
    // the final plan's ONLY inputs are the checkpointed cells RDD — the
    // orders parquet is read exactly once, inside the checkpoint subtree
    "FileScan parquet".r.findAllIn(plan).size shouldBe 0
    plan should include("ExistingRDD")
  }
}
