package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.queries.TextQueries

/** Structured Streaming twins of the stateless document-curation operators
  * (SURVEY.md §2.1 L; the ingest-curation stages a production pipeline
  * actually streams): BPE tokenization against the trained vocab artifact
  * (x103) and PII scan+redaction (x106). Both are one-pass row-local maps —
  * zero state, zero watermark, append mode — so the streaming form IS the
  * batch transform applied to an unbounded frame: each twin delegates to
  * the exact private[graft] transform the oracle-checked batch query runs
  * (TextQueries.bpeEncodeDocs / piiScanRedact), which makes batch/stream
  * drift structurally impossible. DocStreamSpec pins parity per micro-batch
  * against the batch output on the same rows.
  *
  * Scale stance: a stateless map pipeline backpressures purely on source
  * throughput — executors hold no state store, checkpoints carry only
  * source offsets, and the per-row cost is identical to batch (same
  * codegen'd kernels: `graft_bpe_tokens`, the fused regex chain). The
  * merge table joins stream-static as a broadcast 1-row frame, exactly the
  * artifact posture of batch x103 (vocab trained offline, applied online).
  *
  * Deliberately NOT twinned: the dedup/manifest family (x26/x51/x55/x58/
  * x59/x104/x107/x108). Its core is a transitive closure over the whole
  * candidate-pair graph — a late arrival can merge two existing clusters
  * and retroactively change every member's label, survivor, and split, so
  * no append-mode emission is ever final (the same argument as
  * EventStream's x53/x54 note: a global fixpoint, like a global sort, has
  * no streaming form). The streaming-shaped slice of that family that IS
  * sound — probe NEW docs against the DURABLE corpus signature artifact
  * without relabeling the corpus — exists as `TextQueries.nearDupProbe`
  * over a stream (DocStreamSpec's first test).
  */
object DocStream {

  /** File-source ingest: tail a directory of documents parquet as an
    * unbounded stream (the batch twin is the `documents` table). Explicit
    * schema — streaming sources cannot infer. */
  def readDocuments(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("source", StringType),
        StructField("lang", StringType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Streaming BPE encode (x103 twin): tokenize each arriving document
    * against the trained merge table (static 1-row broadcast frame, e.g.
    * `TextQueries.bpeMergeTable` output or a vocab artifact read from
    * parquet). Emits (doc_id, n_tokens, head_tokens) in append mode. */
  def encodeTokens(docs: DataFrame, merges: DataFrame): DataFrame =
    TextQueries.bpeEncodeDocs(docs, merges)

  /** Streaming PII scan + redaction (x106 twin): per-pattern counts and
    * the redacted text's fingerprint for each arriving document. Emits
    * (doc_id, n_emails, n_phones, n_ips, clean_md5, n_chars_clean) in
    * append mode. */
  def piiRedact(docs: DataFrame): DataFrame =
    TextQueries.piiScanRedact(
      docs.select(docs.col("doc_id"), docs.col("text").as("planted")))

  /** Continuously-maintained corpus datasheet (the STATEFUL twin of x113's
    * incremental merge): the arriving document stream folds into the same
    * mergeable per-source statistic set the batch artifact stores
    * (`TextQueries.datasheetStatsOf` — counts/sums/lang-set/min/max).
    * Streaming aggregation IS the merge here: the state store holds
    * exactly one mergeable-stats row per source, and every micro-batch
    * map-side combines then monoid-merges into it — x113's
    * merge(stored, batch) run live, with the state store playing the
    * durable artifact. Update mode emits each refreshed source row;
    * n_docs is monotone, so the latest emission per source IS the current
    * datasheet (DocStreamSpec pins multiset parity with the batch stats
    * over the union of all micro-batches, langs as a set). No watermark:
    * the datasheet is corpus-lifetime state, |sources|-bounded by design —
    * the same reason the batch artifact is sources-sized. */
  def datasheetUpdates(docs: DataFrame): DataFrame =
    TextQueries.datasheetStatsOf(docs)

  /** Continuously-maintained tokenizer-fertility table (the STATEFUL twin
    * of x123): each arriving document is encoded against the trained merge
    * table (static broadcast, the x103 artifact posture) and folded into
    * per-language (n_docs, n_words, n_tokens) sums — a pure monoid, so the
    * state store holds exactly one sums row per lang and the exact
    * floor-div fertility is re-derived on every emission. Update mode;
    * n_docs is monotone per lang, so the latest emission per lang IS the
    * current fairness table. |langs|-bounded state by design, no
    * watermark — same lifetime argument as the datasheet twin. */
  def fertilityUpdates(docs: DataFrame, merges: DataFrame): DataFrame =
    TextQueries.fertilityStatsOf(docs, merges)

  /** Continuously-maintained gate-rule ABLATION waterfall (the STATEFUL
    * twin of x151, the datasheet/fertility pattern): each arriving doc's
    * four x64 rule verdicts fold into the per-source 16-sum wide
    * aggregate — every cell a pure integer monoid, so the state store
    * holds exactly one row per source and the live table is exact at
    * every emission. Update mode; fail counts are monotone, so the
    * latest emission per source IS the current waterfall; the (source,
    * rule) melt is a read-side reshape
    * ([[graft.queries.TextQueries]].gateAblationMelt — a union of
    * aggregations is not streamable, and doesn't need to be). The alarm
    * this feeds: a rule whose cascade share of INCOMING docs jumps is a
    * feed change the batch ablation only sees at the next release.
    * |sources|-bounded state, no watermark — corpus-lifetime state, the
    * datasheet twin's argument. */
  def gateAblationUpdates(docs: DataFrame): DataFrame =
    TextQueries.gateAblationWideOf(docs)

  /** Streaming DECONTAMINATION admission (x35's gram rule as a live gate —
    * the third admission axis, after near-dup [[nearDupAdmission]] and
    * budget [[quotaAdmission]]): each arriving doc's distinct 5-grams are
    * intersected ROW-LOCALLY with the broadcast benchmark gram set
    * ([[graft.queries.TextQueries.evalGramTable]], the trained-offline /
    * broadcast-online artifact posture); admitted ⇔ zero hits. Emits
    * (doc_id, n_hits, admitted) in append mode.
    *
    * Stateless BY CONSTRUCTION — the verdict is one codegen'd HOF per row
    * (no explode, no distinct, no per-doc rollup: the join form x35 uses
    * in batch would need two streaming aggregations), so there is no
    * state store, replay is trivially idempotent, and the stream never
    * shuffles. At 100 TB the gram array becomes hashed grams behind a
    * Bloom/set broadcast; the plumbing (static broadcast side, row-local
    * membership) is identical. */
  def deconAdmission(docs: DataFrame, evalGrams: DataFrame): DataFrame =
    TextQueries.deconProbeOf(docs, evalGrams)

  /** Streaming QUALITY census (x135's live form — the doc-axis sibling of
    * EmbStream's cell census and EventStream's drift bins): each arriving
    * micro-batch is scored against the PINNED bigram-LM artifact
    * ([[graft.queries.TextQueries.lmModelOf]] — trained offline, the CCNet
    * posture; a stream cannot retrain its own reference) and bucketed
    * against the PINNED tertile thresholds
    * ([[graft.queries.TextQueries.lmThresholdsOf]]), then the
    * (epoch, lang, bucket, n) rows commit through the idempotent epoch
    * sink. The live dashboard is a read-side rollup over epochs; a
    * sustained shift of incoming mass out of `head` is the
    * data-quality-regression alarm a curation deployment watches.
    *
    * Two chained aggregations (per-doc score, then the census) rule out
    * a plain streaming aggregation — hence foreachBatch with batch
    * semantics per epoch (the quotaAdmission pattern, minus state: the
    * census needs none). Replay: a redelivered epoch recomputes the same
    * rows against the same pinned artifacts and dynamically overwrites
    * ONLY its own partition ([[EventStream.writeEpoch]]), so at-least-once
    * delivery converges. Scale: the model join is the x62 shuffle shape
    * per micro-batch; census state is ≤ |langs|×3 rows per epoch. */
  def qualityCensus(docs: DataFrame, model: DataFrame, thresholds: DataFrame,
      outPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // The "pinned artifact" posture made REAL, not assumed (r16 advice): a
    // caller that built the two reference frames in-process hands us the
    // full x62 bigram-chain lineage, and foreachBatch would re-execute it
    // every micro-batch. Both frames are bounded (vocab-sized /
    // |langs|-sized), so pin them once here — after this, each epoch reads
    // materialized rows whatever the caller did.
    val m = model.localCheckpoint(eager = true)
    val t = thresholds.localCheckpoint(eager = true)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        EventStream.writeEpoch(qualityCensusBatch(batch.toDF(), m, t), epoch, outPath)
      }
      .start()
  }

  /** The factored per-epoch census body (batch ≡ stream by construction;
    * the spec replays an epoch through it directly). */
  private[graft] def qualityCensusBatch(batch: DataFrame, model: DataFrame,
      thresholds: DataFrame): DataFrame =
    TextQueries.qualityCensusOf(
      TextQueries.scoreAgainstLmModel(batch, model), thresholds)

  /** Streaming per-source token-QUOTA admission — the budget axis of live
    * curation, completing what [[nearDupAdmission]] did for the dup axis
    * (r15 verdict item 5): an unbounded document stream is admitted
    * against the x128/x129-style per-source token budgets until each
    * source's quota is spent, with the batch x53 cut rule applied to the
    * concatenated stream order.
    *
    * Cut rule (EXACTLY x53's, so batch and stream agree on semantics): a
    * doc is admitted iff the tokens consumed before it — prior epochs'
    * admitted mass plus this batch's running prefix in (md5(doc_id),
    * doc_id) order — is strictly under the source's quota; the crossing
    * doc is admitted (overshoot-by-one), everything after is cut. Across
    * batches the order is arrival order; within a batch it is the same
    * content-independent hash order as batch x53, computed by the SAME
    * `PrefixQuota.runningBefore` bucket-split pass (a micro-batch can be
    * arbitrarily large — the per-source serialization hazard doesn't
    * disappear because the input is a stream). A source with no quota row
    * admits nothing (admission control: no budget, no entry).
    *
    * State is NOT a state store: the per-source consumed ledger is a
    * durable epoch-partitioned artifact ([[EventStream.writeEpoch]] —
    * sources-sized rows per epoch), and each batch reads the ledger AS OF
    * the latest epoch strictly BEFORE itself. That read rule is what makes
    * at-least-once replay deterministic: a replayed epoch recomputes from
    * exactly the prior state the first attempt saw (its own half-committed
    * rows are excluded by the `< epoch` filter) and dynamically overwrites
    * its own partitions in both artifacts — the ledger and the admitted
    * manifest converge instead of double-counting. Monoid argument as the
    * datasheet twin: per-source consumed tokens only add. */
  def quotaAdmission(docs: DataFrame, quotas: DataFrame, statePath: String,
                     acceptedPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        quotaAdmitBatch(batch.toDF(), epoch, quotas, statePath, acceptedPath)
        ()
      }
      .start()

  /** One [[quotaAdmission]] micro-batch, factored out so DocStreamSpec can
    * re-deliver the SAME epoch (the at-least-once shape) and assert both
    * artifacts converge. Returns the admitted frame (pinned) so the
    * composed pipeline ([[admitBatch]]) can key its index append off it
    * without re-reading the epoch it just wrote. */
  private[graft] def quotaAdmitBatch(b0: DataFrame, epoch: Long, quotas: DataFrame,
                                     statePath: String, acceptedPath: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val s = b0.sparkSession
    import s.implicits._
    val b = b0.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    // Ledger AS OF the latest epoch strictly before this one (the replay
    // rule), via the ONE factored reader the compaction job round-trips
    // against ([[graft.sources.Sinks.ledgerBeforeEpoch]]). EAGER
    // checkpoint: the ledger read must be fully cut out of every later
    // lineage — the state write below dynamically overwrites the SAME
    // path, and Spark refuses a plan that reads a path it is overwriting
    // (and a lazy lineage surviving into that write is exactly the loaner
    // hazard the x131 rank bug taught).
    val statePathH = new org.apache.hadoop.fs.Path(statePath)
    val fs = statePathH.getFileSystem(s.sparkContext.hadoopConfiguration)
    val prior = (
      if (!fs.exists(statePathH)) Seq.empty[(String, Long)].toDF("source", "prior_tokens")
      else graft.sources.Sinks.ledgerBeforeEpoch(s, statePath, epoch,
          key = "source", value = "consumed_tokens")
        .withColumnRenamed("consumed_tokens", "prior_tokens")
      ).localCheckpoint(eager = true)
    // inner join: a source with no quota row admits nothing, by contract
    val rows = b.join(broadcast(quotas.select(col("source"), col("quota_tokens"))),
        Seq("source"))
      .join(broadcast(prior), Seq("source"), "left")
      .na.fill(0L, Seq("prior_tokens"))
    val admitted = graft.operators.PrefixQuota.runningBefore(
        rows, "source",
        orderKey = md5(col("doc_id").cast("string")), tie = col("doc_id"),
        value = col("n_tok"))
      .withColumn("offset_tokens", col("prior_tokens") + col("cum_before"))
      .filter(col("offset_tokens") < col("quota_tokens"))
      .select("doc_id", "source", "n_tok", "offset_tokens", "quota_tokens")
      .localCheckpoint(eager = true) // both writes below read this pin
    EventStream.writeEpoch(admitted, epoch, acceptedPath)
    val newState = admitted.groupBy("source")
      .agg(sum("n_tok").as("batch_tokens"))
      .join(broadcast(prior), Seq("source"), "left")
      .na.fill(0L, Seq("prior_tokens"))
      .select(col("source"),
        (col("prior_tokens") + col("batch_tokens")).as("consumed_tokens"))
    EventStream.writeEpoch(newState, epoch, statePath)
    admitted
  }

  /** Streaming near-dup ADMISSION CONTROL — the ingest-time form of x37's
    * incremental probe, closing the durable-index lifecycle LIVE: each
    * arriving micro-batch probes the [[graft.queries.TextQueries.saveMinhashIndex]]
    * artifact with the EXACT batch transforms (`nearDupProbe` /
    * `minhashPairs` / `exactCollapse`, shared verbatim), writes the flagged
    * (doc_id, corpus_doc_id, jaccard) pairs through the idempotent epoch
    * sink, and appends the ACCEPTED novel docs to the index so the NEXT
    * batch probes the grown corpus — including near-dups of docs admitted
    * one batch earlier.
    *
    * Admission means the index must stay dup-free, so the flag set covers
    * all three collision surfaces: (1) vs the INDEX (nearDupProbe);
    * (2) exact dups WITHIN the batch (exactCollapse non-reps, attributed
    * to their representative at jaccard 1.0 — the text-keyed join is
    * batch-sized, never corpus-sized); (3) near dups WITHIN the batch
    * (minhashPairs over the batch's own collapsed signatures — the later
    * id flags against the earlier, so exactly the earliest of an
    * intra-batch clique is admitted).
    *
    * Replay discipline (foreachBatch is at-least-once; the index append is
    * NOT transactional with the checkpoint): (a) index hits EXCLUDE corpus
    * rows carrying this batch's own ids, so an epoch replayed after a
    * crash-between-append-and-commit never flags docs against their own
    * half-committed signatures — the replay recomputes the SAME hits as
    * the first attempt and the epoch sink overwrites its own partition
    * idempotently; (b) the append drops docs already present in the index
    * (the batch-sized `alreadyIndexed` set, materialized BEFORE the write
    * so nothing reads the index path while appending to it), so a replay
    * appends nothing — the index converges instead of duplicating.
    *
    * No state store at all: the "state" IS the durable index artifact,
    * exactly as in batch — which is why this family CAN stream while the
    * full-corpus dedup (global transitive closure) cannot.
    *
    * ID PRECONDITION (r15 advice): both replay-hygiene rules above are
    * id-keyed, so they are only sound when `doc_id` is globally unique and
    * never REBOUND to different text — a legitimately re-ingested id with
    * new content would silently lose its near-dup flags (excluded as "own
    * id") and never be re-admitted (skipped as "already indexed"). The
    * precondition is ASSERTED, not assumed: each batch compares its ids'
    * recomputed shingle sets against the index rows they collide with and
    * FAILS the stream on the first mismatch (an id collision is an
    * upstream id-allocation bug; admitting either half corrupts the
    * index). The check is an equi-join on doc_id with the batch side tiny,
    * and shingles are computed only for the colliding rows. Caveat: docs
    * under 3 tokens have an empty shingle set, so a rebound id between two
    * such degenerate texts is indistinguishable — their near-dup semantics
    * are equally degenerate. */
  def nearDupAdmission(docs: DataFrame, indexPath: String, hitsPath: String,
                       checkpoint: String,
                       appendAccepted: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        val b = batch.toDF().select("doc_id", "text")
        val survivors = nearDupAdmitBatch(b, epoch, indexPath, hitsPath)
        if (appendAccepted)
          appendNovelToIndex(b.join(survivors, Seq("doc_id"), "left_semi"), indexPath)
      }
      .start()

  /** One [[nearDupAdmission]] micro-batch MINUS the index append: verdicts
    * + hit-log write. Returns the surviving (novel, non-dup) doc ids —
    * what the next admission axis consumes in the composed pipeline.
    * NOTE the survivors do NOT exclude already-indexed ids: a replayed doc
    * whose signature committed on the first attempt must flow downstream
    * exactly as it did then (the quota epoch overwrite makes that read
    * idempotent); only the APPEND ([[appendNovelToIndex]]) skips it. */
  private[graft] def nearDupAdmitBatch(b0: DataFrame, epoch: Long,
      indexPath: String, hitsPath: String): DataFrame = {
    val b = b0.select("doc_id", "text")
    val sigs = b.sparkSession.read.parquet(indexPath)
    val bIds = b.select("doc_id")
    // fail fast on id reuse with different content (see scaladoc) —
    // bounded: ≤4 collision rows reach the driver, only to name them
    val collisions = b
      .join(sigs.select(col("doc_id"), col("sh").as("index_sh")), Seq("doc_id"))
      .filter(org.apache.spark.sql.functions.expr("graft_shingles(text, 3)")
        =!= col("index_sh"))
      .select("doc_id").limit(4).collect()
    if (collisions.nonEmpty) throw new IllegalStateException(
      "nearDupAdmission: incoming doc_id(s) " +
        collisions.map(_.getLong(0)).mkString(", ") +
        " already exist in the index with DIFFERENT text — doc ids must " +
        "be globally unique and never rebound (id-keyed replay hygiene " +
        "would silently drop their near-dup flags)")
    // (1) vs the index — minus this batch's own ids (replay hygiene)
    val indexHits = TextQueries.nearDupProbe(b, sigs)
      .join(bIds.withColumnRenamed("doc_id", "corpus_doc_id"),
        Seq("corpus_doc_id"), "left_anti")
    // (2) exact dups within the batch → their representative
    val intraExact = b
      .join(TextQueries.exactCollapse(b).select("text", "keep_id"), Seq("text"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), col("keep_id").as("corpus_doc_id"),
        lit(1.0).as("jaccard"))
    // (3) near dups within the batch → the earlier id wins
    val intraNear = TextQueries.minhashPairs(TextQueries.minhashSignaturesOf(b))
      .select(col("doc_b").as("doc_id"), col("doc_a").as("corpus_doc_id"),
        col("jaccard"))
    // eager: cut the index read out of every later lineage BEFORE any
    // append adds files to the same path
    val hits = indexHits.unionByName(intraExact).unionByName(intraNear)
      .localCheckpoint(eager = true)
    EventStream.writeEpoch(hits, epoch, hitsPath)
    bIds.join(hits.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
  }

  /** The index-append half of near-dup admission: add `docs` (doc_id,
    * text) signatures to the durable index, skipping ids already present
    * (replay convergence — see [[nearDupAdmission]]'s discipline (b)).
    * The skip set is pinned BEFORE the append so nothing reads the index
    * path while writing to it. */
  private[graft] def appendNovelToIndex(docs: DataFrame, indexPath: String): Unit = {
    val b = docs.select("doc_id", "text")
    val alreadyIndexed = b.select("doc_id")
      .join(b.sparkSession.read.parquet(indexPath).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .localCheckpoint(eager = true) // pre-append, same hazard rule
    TextQueries.appendToMinhashIndex(
      b.join(alreadyIndexed, Seq("doc_id"), "left_anti"), indexPath)
  }

  /** The COMPOSED live-curation admission — the three axes a production
    * ingest actually runs as ONE pipeline, in x134's order: contamination
    * gate first (row-local, cheapest — a benchmark-tainted doc must not
    * cost shingle work, index probes, or budget), then near-dup vs the
    * durable index + both intra-batch surfaces, then the token quota cut
    * over what SURVIVED — so a doc the dup axis rejected can never consume
    * budget in the same micro-batch (the interaction no single-axis test
    * can see, and exactly the r16 verdict's composition ask).
    *
    * Artifacts per epoch (all through the idempotent epoch sink):
    * decon verdicts → `deconPath`; near-dup hit pairs → `hitsPath`;
    * admitted manifest + consumed-token ledger → `acceptedPath`/
    * `statePath` (quotaAdmitBatch's two, unchanged).
    *
    * Index membership = the ADMITTED corpus (x134's release stance): only
    * docs that cleared all three axes append their signatures, so a future
    * near-dup of a doc the quota cut never shipped is judged on its own
    * merits rather than rejected against phantom corpus text.
    *
    * Intra-batch caveat (r17 advice, ACCEPTED consequence of the
    * decon → dup → quota order): WITHIN one micro-batch, a doc flagged as
    * a near-dup of a batch peer stays rejected even when that peer then
    * dies at the quota axis — for that epoch it was cut against text that
    * never joined the corpus. This is deliberate: re-admitting such docs
    * would re-enter the quota axis for the same epoch, making each
    * source's budget order dependent on the batch's dup topology (and
    * recursively so, since a re-admitted doc can itself be quota-cut
    * while representing further dups). The own-merits stance is
    * CROSS-EPOCH: the quota-cut peer never reaches the index, so the
    * same text redelivered in any later epoch is judged fresh
    * (DocStreamSpec "intra-batch phantom rejection" pins both halves).
    *
    * Replay: every stage is the factored single-axis batch body with its
    * own proven discipline (decon is stateless; near-dup excludes own-id
    * index rows and skips already-indexed appends; quota reads the ledger
    * AS-OF strictly-before and overwrites only its own partitions), and the
    * stage WIRING is pure column pruning — so redelivering an epoch
    * reproduces every artifact and the index byte-identically
    * (DocStreamSpec redelivers through [[admitBatch]] and asserts all
    * four paths + the index converge). */
  def admission(docs: DataFrame, evalGrams: DataFrame, quotas: DataFrame,
      indexPath: String, deconPath: String, hitsPath: String,
      statePath: String, acceptedPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // pin the two reference artifacts once (the qualityCensus posture,
    // r17 review): an in-process evalGramTable hands us the full 5-gram
    // explode + collect_set lineage, and foreachBatch would re-extract
    // and re-broadcast the benchmark set EVERY micro-batch; both frames
    // are bounded (1-row gram array / |sources| quota rows)
    // re-assert the broadcast hint: the checkpoint truncates the plan to
    // an ExistingRDD whose size estimate is the pessimistic default, and
    // deconProbeOf's crossJoin must broadcast THIS side, never the stream
    val ev = org.apache.spark.sql.functions.broadcast(
      evalGrams.localCheckpoint(eager = true))
    val qu = quotas.localCheckpoint(eager = true) // quotaAdmitBatch re-hints at its join
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        admitBatch(batch.toDF(), epoch, ev, qu,
          indexPath, deconPath, hitsPath, statePath, acceptedPath)
      }
      .start()
  }

  /** One composed [[admission]] micro-batch over (doc_id, source, text) —
    * factored so DocStreamSpec can drive the full decon → near-dup → quota
    * chain directly and re-deliver the same epoch. */
  private[graft] def admitBatch(b0: DataFrame, epoch: Long, evalGrams: DataFrame,
      quotas: DataFrame, indexPath: String, deconPath: String, hitsPath: String,
      statePath: String, acceptedPath: String): Unit = {
    val b = b0.select("doc_id", "source", "text")
      // every axis + the append reads this batch; pin it once
      .localCheckpoint(eager = true)
    // axis 1: decon — one codegen'd HOF per row against the broadcast
    // benchmark grams; rejected docs stop HERE, before any shingle work
    val dec = TextQueries.deconProbeOf(b.select("doc_id", "text"), evalGrams)
      .localCheckpoint(eager = true) // verdict log + the downstream filter
    EventStream.writeEpoch(dec, epoch, deconPath)
    val clean = b.join(dec.filter(col("admitted")).select("doc_id"), Seq("doc_id"))
    // axis 2: near-dup vs index + intra-batch (hit log written inside)
    val novel = clean.join(
      nearDupAdmitBatch(clean.select("doc_id", "text"), epoch, indexPath, hitsPath),
      Seq("doc_id"), "left_semi")
    // axis 3: token quota — only dup-survivors consume budget
    val admitted = quotaAdmitBatch(novel, epoch, quotas, statePath, acceptedPath)
    // the release joins the corpus: admitted docs only (see scaladoc)
    appendNovelToIndex(
      novel.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi"), indexPath)
  }
}
