package graft.sources

import org.apache.spark.sql.DataFrame

/** Output sinks (SURVEY.md §2.1 A4). The reference only prints/plots; a real
  * engine needs durable, re-readable outputs — parquet, optionally
  * partitioned, with file counts controlled so 1000 executors don't emit
  * 1000 tiny files per partition value.
  */
object Sinks {

  /** Plain parquet snapshot (the Verify dump uses this shape). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** JSONL (one JSON object per line) corpus export — the interchange
    * format corpus releases actually ship (and what most raw crawls arrive
    * as). gzip per-file: JSONL compresses ~5× and stays SPLITTABLE at the
    * file level because each file is one member (a 1000-file export reads
    * with 1000-way parallelism; only intra-file parallelism is lost, which
    * `maxRecordsPerFile`-style sizing at write time already bounds). */
  def jsonlCorpus(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** As-of read over an epoch-partitioned table (the read half of
    * `streaming.EventStream.exactlyOnceParquetSink`'s contract): the state
    * of the table as of micro-batch `epoch`, served by Hive PARTITION
    * PRUNING — the `__epoch <= N` predicate resolves against directory
    * names at planning time, so later epochs' files are never opened, let
    * alone read (the poor man's time travel that a transactional table
    * format replaces with snapshot metadata). SinksSpec asserts the
    * pruning in the plan, not just the row set. */
  def readAsOfEpoch(spark: org.apache.spark.sql.SparkSession, path: String,
      epoch: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path).filter(col("__epoch") <= epoch)
  }

  /** Latest-wins keyed read of an epoch-partitioned LEDGER strictly BEFORE
    * `epoch` — the AS-OF rule [[graft.streaming.DocStream.quotaAdmitBatch]]
    * replays deterministically under at-least-once delivery (a replayed
    * epoch's own half-committed rows are excluded by the `< epoch` cut).
    * Per key, the value from the row with the greatest `__epoch < epoch`
    * wins; keys absent from every prior epoch are absent from the result.
    * Partition pruning serves the epoch cut from directory names alone,
    * exactly as in [[readAsOfEpoch]]. Factored here so the compaction
    * round-trip ([[compactEpochLedger]]) is testable against the ONE read
    * the admission path actually uses. */
  def ledgerBeforeEpoch(spark: org.apache.spark.sql.SparkSession, path: String,
      epoch: Long, key: String, value: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, max, struct}
    spark.read.parquet(path).filter(col("__epoch") < epoch)
      .groupBy(col(key))
      .agg(max(struct(col("__epoch"), col(value))).getField(value).as(value))
  }

  /** Fold a keyed latest-wins ledger's epoch history ≤ `upTo` into ONE base
    * partition at `__epoch = upTo` — the retention/compaction unit the
    * per-epoch directory layout was designed to give
    * ([[graft.streaming.EventStream.writeEpoch]]'s scaladoc): a long-lived
    * ingest writes |keys| rows per epoch forever, and this job bounds the
    * directory count without changing ANY read the admission path performs.
    *
    * Correctness: per key, the folded row carries the value of the greatest
    * epoch ≤ `upTo` stamped AT epoch `upTo`, so `max(struct(__epoch, v))`
    * over any window that includes the base — [[ledgerBeforeEpoch]] at
    * every `epoch > upTo`, [[readAsOfEpoch]] folded the same way — returns
    * exactly what the uncompacted history returned (the struct max compares
    * epoch first; within one key the folded epoch dominates all folded-away
    * ones and the value is unchanged).
    *
    * Crash-safety ordering: the base partition is WRITTEN FIRST (dynamic
    * overwrite touches only `__epoch=upTo`), older partitions are deleted
    * after. A crash between the two leaves stale older directories behind,
    * which latest-wins reads IGNORE (the base row dominates per key) — so
    * the job is safely re-runnable, never a read-wrong window.
    *
    * PRECONDITIONS: (1) `upTo` must be ≤ the stream's last COMMITTED
    * epoch. Structured Streaming only ever redelivers the batch in flight
    * at a crash (no commit-log entry), so committed epochs are never
    * replayed — but a replay OF `upTo` itself after compaction would read
    * an empty prior window (`< upTo` excludes the base) and double-admit.
    * (2) The consuming stream must be QUIESCENT (between micro-batches,
    * or stopped — r17 review): a ledger read planned against the old
    * epoch directories whose tasks execute after the delete dies with
    * FileNotFoundException; run compaction from the maintenance window,
    * not concurrently with an in-flight batch (a table format with
    * snapshot isolation removes this constraint — same caveat as
    * [[compactParquet]]'s swap). */
  def compactEpochLedger(spark: org.apache.spark.sql.SparkSession, path: String,
      upTo: Long, key: String, value: String): Unit = {
    import org.apache.spark.sql.functions.{col, lit, max, struct}
    // The fold below projects to exactly (key, value, __epoch). A wider
    // ledger would silently lose its extra columns in the base write —
    // and a crash between the base write and the delete would then leave
    // MIXED-schema partitions that a plain spark.read.parquet resolves
    // from one sampled file (r17 advice). Refuse wider ledgers up front —
    // and detect them DETERMINISTICALLY: ONE mergeSchema read serves both
    // the validation and the fold (r18 advice + r19 self-review: without
    // mergeSchema the require would pass or fail by footer-sampling luck,
    // and a second plain read would re-resolve a schema the require never
    // validated).
    val ledger = spark.read.option("mergeSchema", "true").parquet(path)
    val cols = ledger.columns.toSet
    require(cols == Set(key, value, "__epoch"),
      s"compactEpochLedger: ledger at $path has columns ${cols.toSeq.sorted.mkString("(", ", ", ")")}; " +
        s"this fold preserves exactly ($key, $value, __epoch) — compacting a wider " +
        "ledger would silently drop the extra columns from the folded base")
    val base = ledger
      .filter(col("__epoch") <= upTo)
      .groupBy(col(key))
      .agg(max(struct(col("__epoch"), col(value))).getField(value).as(value))
      // eager: the write below dynamically overwrites a partition of the
      // very path this plan reads — cut the read out of the write's lineage
      .localCheckpoint(eager = true)
    base.withColumn("__epoch", lit(upTo))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("__epoch")
      .parquet(path)
    dropEpochsBefore(spark, path, upTo)
  }

  /** The last epoch the stream at `checkpointLocation` has COMMITTED, read
    * from the checkpoint's own commit log (`commits/<batchId>`, one file
    * per completed micro-batch — foreachBatch epoch ids ARE these batch
    * ids). None when the log doesn't exist or holds no committed batch
    * yet. Structured Streaming writes the commit file strictly AFTER the
    * batch body succeeds, so every epoch ≤ this value is replay-immune —
    * exactly [[compactEpochLedger]]'s precondition (1). */
  def lastCommittedEpoch(spark: org.apache.spark.sql.SparkSession,
      checkpointLocation: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(checkpointLocation, "commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).iterator
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .maxOption
  }

  /** [[compactEpochLedger]] with `upTo` DERIVED from the consuming
    * stream's commit log instead of caller-supplied — the r17 verdict's
    * "automate the precondition" item: a hand-picked `upTo` past the last
    * committed epoch is the one way to make a later replay double-admit,
    * and this entry point makes that footgun unloadable. No-ops (None)
    * when the stream has committed nothing. The QUIESCENCE precondition
    * remains the caller's: run from the maintenance window, with the
    * stream stopped or between micro-batches. Returns the epoch folded
    * to, for the maintenance job's log line. */
  def compactCommitted(spark: org.apache.spark.sql.SparkSession,
      checkpointLocation: String, path: String, key: String,
      value: String): Option[Long] =
    lastCommittedEpoch(spark, checkpointLocation).map { e =>
      compactEpochLedger(spark, path, e, key, value); e
    }

  /** Retention for epoch-partitioned APPEND artifacts (hit logs, admitted
    * manifests, census rows): delete `__epoch=e` directories with
    * `e < cutoff` and return how many were dropped. This is a POLICY
    * delete, not a semantics-preserving fold — readers must only need
    * windows ≥ `cutoff` (for keyed ledgers use [[compactEpochLedger]],
    * which preserves the as-of reads exactly). Same precondition as
    * compaction: only epochs the checkpoint has committed, since a
    * replayed epoch would re-create its directory from scratch. */
  def dropEpochsBefore(spark: org.apache.spark.sql.SparkSession, path: String,
      cutoff: Long): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return 0
    val old = fs.listStatus(hPath).filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        p.getName.startsWith("__epoch=") &&
          scala.util.Try(p.getName.stripPrefix("__epoch=").toLong)
            .toOption.exists(_ < cutoff)
      }
    old.foreach(p => fs.delete(p, true))
    old.length
  }

  /** JSONL corpus read with an EXPLICIT schema — never schema inference,
    * which at corpus scale is a full extra pass over 100 TB before the
    * first real job, and silently widens/narrows types when a shard's
    * fields drift. Malformed lines land in `_corrupt_record` (PERMISSIVE)
    * instead of killing the read: a crawl dump always has a few. */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Hive-style partitioned parquet with a bounded file count per directory.
    *
    * Repartitioning on the partition columns alone hashes each distinct
    * partition value into exactly ONE task — every directory gets one file
    * regardless of any multiplier, and a hot partition value funnels its
    * entire data through a single task (the skew this sink exists to avoid).
    * Instead the shuffle key is salted: `pmod(hash(allCols), n)` splits each
    * partition value across up to `filesPerPartition` tasks, so a directory
    * gets at most `filesPerPartition` files AND a hot value's rows spread
    * over that many writers. The salt is a deterministic hash of the row
    * (not rand()), so retried tasks re-produce the same placement. */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
      filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions.{col, hash, pmod, lit}
    val n = math.max(filesPerPartition, 1)
    val salt = pmod(hash(df.columns.map(col): _*), lit(n))
    df.repartition(
        n * math.max(df.sparkSession.sparkContext.defaultParallelism / 4, 1),
        partitionCols.map(col) :+ salt: _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Single-file CSV export for small result tables (rankings, summaries) —
    * coalesce(1) is only safe because ranking outputs are aggregate-sized. */
  def smallCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Range-sorted parquet: repartition by range on `sortCols` then sort
    * within partitions before writing, so each file (and row group) covers
    * a tight, disjoint min/max interval of the sort key. Readers filtering
    * on that key then skip whole files/row groups from parquet statistics
    * alone — the write-time half of predicate pushdown at 100 TB (the scan
    * half is `PushedFilters`, see PLANS.md). */
  def sortedParquet(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    val n = if (numFiles > 0) numFiles
      else math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-ordered parquet: cluster the layout on the Morton interleave of two
    * bucketed dimensions ([[graft.functions.ZOrder.zValue]]) so parquet
    * min/max stats prune scans filtered on EITHER dimension — the
    * two-dimensional generalization of [[sortedParquet]] (whose layout
    * only prunes its leading column). The written files keep the `__z`
    * column: its per-file/row-group stats are the pruning index, and
    * range-partitioning on it guarantees disjoint per-file z-intervals
    * (ZOrderSpec asserts both the bit-exact curve and the disjointness).
    * `aCol`/`bCol` must be non-negative integral bucket columns — bucket
    * real-valued or signed dimensions first (values are masked to 21
    * bits). */
  def zOrderedParquet(df: DataFrame, path: String, aCol: String, bCol: String,
      numFiles: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    val z = graft.functions.ZOrder.zValue(col(aCol), col(bCol))
    val n = if (numFiles > 0) numFiles
      else math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    df.withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite a parquet path into ~`targetFileMB`
    * files (optionally range-sorted for data skipping) and swap it in
    * place. The lake-maintenance job every micro-batch ingest needs — a
    * streaming sink leaves one file per trigger, and a 100 TB table read
    * through thousands of KB-sized files pays footer/open costs that dwarf
    * the scan. File count = ceil(input bytes / target), so output sizes
    * track data volume, not partition history.
    *
    * The swap (write tmp → delete → rename) is NOT transactional — a
    * reader racing the rename sees a missing path. That is inherent to
    * raw-directory parquet; production tables get atomicity from a table
    * format's metadata commit (e.g. an Iceberg/Delta snapshot swap) with
    * this same rewrite underneath.
    *
    * Hive-partitioned datasets MUST pass `partitionCols`, or the rewrite
    * would silently flatten the directory layout (the partition columns
    * read back as data columns and write into plain files). With
    * `partitionCols` the rewrite re-partitions by (partition values,
    * deterministic salt) so each directory gets ~`targetFileMB`-sized
    * files, same as [[partitionedParquet]]. Returns the target file count. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileMB: Int = 128, sortCols: Seq[String] = Nil,
      partitionCols: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    require(targetFileMB >= 1, s"targetFileMB must be >= 1, got $targetFileMB")
    require(sortCols.isEmpty || partitionCols.isEmpty,
      "sortCols and partitionCols are mutually exclusive compaction layouts")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / (targetFileMB.toLong << 20)).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val df = spark.read.parquet(path)
    val writer =
      if (partitionCols.nonEmpty) {
        val salt = pmod(hash(df.columns.map(col): _*), lit(n))
        df.repartition(partitionCols.map(col) :+ salt: _*)
          .write.partitionBy(partitionCols: _*)
      } else if (sortCols.isEmpty) df.repartition(n).write // round-robin → even sizes
      else df.repartitionByRange(n, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*).write
    writer.mode("overwrite").parquet(tmp.toString)
    fs.delete(hPath, true)
    if (!fs.rename(tmp, hPath))
      throw new java.io.IOException(s"compaction rename failed: $tmp -> $hPath")
    n
  }

  /** Training-shard writer — the durable half of x56
    * ([[graft.queries.TextQueries.corpusShards]]): shard by a
    * content-independent hash of `idCol`, order within each shard by the
    * same hash, write one directory per shard with rows in shard order.
    * The layout a pretraining loader assumes: reproducible across runs and
    * cluster sizes, decorrelated from input (crawl/source) order, and
    * produced by ONE exchange + an in-partition sort — no global sort.
    * `hexDigits` picks the fan-out (16^d shards): 1 → 16 for tests,
    * 3 → 4096 for a 100 TB run, identical plan either way. */
  def shardedCorpus(df: DataFrame, path: String, idCol: String,
      hexDigits: Int = 1): Unit = {
    import org.apache.spark.sql.functions.{col, conv, md5, substring, upper}
    val d = math.min(math.max(hexDigits, 1), 8)
    val k = md5(col(idCol).cast("string"))
    df.withColumn("__k", k)
      .withColumn("shard", conv(upper(substring(k, 1, d)), 16, 10).cast("int"))
      .repartition(col("shard"))
      // shard leads the sort so the file writer's required partition-column
      // ordering is already satisfied (no second, order-unstable sort gets
      // inserted above the writer); __k then orders rows WITHIN each shard
      .sortWithinPartitions("shard", "__k", idCol)
      .drop("__k")
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
  }

  /** Bucketed managed table: co-locates future joins/aggregations on
    * `bucketCols` — two tables bucketed the same way join with ZERO
    * exchanges. This is the storage-layout half of the 100 TB shuffle
    * budget: pay the clustering once at write time, reuse it every query. */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
