package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SinksSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("bucketed tables join with zero exchanges (co-located join)") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 50L).map(i => (i, s"name_$i")).toDF("k", "name")

    Sinks.bucketedTable(facts, "facts_b", Seq("k"), 8)
    Sinks.bucketedTable(dims, "dims_b", Seq("k"), 8)
    try {
      // joining on the bucket key must need no shuffle on either side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("facts_b").join(spark.table("dims_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange"
      joined.count() shouldBe 1000
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }

  test("partitionedParquet bounds files per directory and spreads hot values over tasks") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // skewed fixture: value "hot" holds 95% of rows, three cold values share the rest
    val df = (1L to 20000L)
      .map(i => (if (i % 20 == 0) s"cold${i % 3}" else "hot", i, s"p$i"))
      .toDF("part", "id", "payload")
    val dir = java.nio.file.Files.createTempDirectory("part-sink").toString + "/t"
    Sinks.partitionedParquet(df, dir, Seq("part"), filesPerPartition = 4)
    val stats = spark.read.parquet(dir)
      .withColumn("f", input_file_name()) // project first: not allowed inside agg
      .groupBy("part").agg(countDistinct(col("f")).as("nf"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    stats.map(_._3).sum shouldBe 20000L
    val hot = stats.find(_._1 == "hot").get
    // the hot value must be written by MORE than one task (skew spread)...
    hot._2 should be > 1L
    // ...and every directory's file count stays within the requested bound
    stats.foreach { case (_, nf, _) => nf should be <= 4L }
  }

  test("compactParquet collapses a many-file path preserving content") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1L to 50000L).map(i => (i, s"payload_$i")).toDF("k", "payload")
    df.repartition(40).write.parquet(dir) // micro-batch-style fragmentation
    val before = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    before shouldBe 40L
    Sinks.compactParquet(spark, dir, targetFileMB = 128)
    val after = spark.read.parquet(dir)
    after.select(input_file_name()).distinct().count() should be < before
    // content survives byte-for-byte (same rows, same values)
    after.count() shouldBe 50000L
    after.agg(sum("k")).head().getLong(0) shouldBe (1L to 50000L).sum
    // sorted variant: re-compact with a sort key → disjoint ranges
    Sinks.compactParquet(spark, dir, targetFileMB = 1, sortCols = Seq("k"))
    spark.read.parquet(dir).count() shouldBe 50000L
  }

  test("jsonlCorpus roundtrip: documents survive JSONL export byte-exactly; corrupt lines quarantine") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/corpus"
    Sinks.jsonlCorpus(docs, dir)
    val back = Sinks.readJsonl(spark, dir, docs.schema)
    // exact multiset parity — text with quotes/newlines/unicode must
    // survive the JSON escaping roundtrip
    back.count() shouldBe docs.count()
    back.exceptAll(docs).count() shouldBe 0L
    docs.exceptAll(back).count() shouldBe 0L
    // a malformed line must not kill the read: it quarantines
    val bad = java.nio.file.Files.createTempDirectory("jsonl-bad").toString + "/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(bad))
    java.nio.file.Files.write(java.nio.file.Paths.get(bad, "part-00000.json"),
      ("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""" +
        "\nnot json at all\n").getBytes("UTF-8"))
    val schemaWithCorrupt = org.apache.spark.sql.types.StructType(
      docs.schema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType))
    val mixed = Sinks.readJsonl(spark, bad, schemaWithCorrupt).cache()
    mixed.filter(col("_corrupt_record").isNull).count() shouldBe 1L
    mixed.filter(col("_corrupt_record").isNotNull).count() shouldBe 1L
    mixed.unpersist()
  }

  test("readAsOfEpoch serves the table as of N via partition pruning, not a full scan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("asof").toString + "/t"
    graft.streaming.EventStream.writeEpoch(Seq((1L, "a")).toDF("id", "v"), 0L, path)
    graft.streaming.EventStream.writeEpoch(Seq((2L, "b")).toDF("id", "v"), 1L, path)
    graft.streaming.EventStream.writeEpoch(Seq((3L, "c")).toDF("id", "v"), 2L, path)
    val asOf1 = Sinks.readAsOfEpoch(spark, path, 1L)
    asOf1.select("id").collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L)
    // the predicate must prune at the DIRECTORY level: the scan's
    // partition filters carry __epoch, and epoch-2 files are never touched
    val scan = asOf1.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in plan"))
    scan.partitionFilters.map(_.toString).mkString should include("__epoch")
    val filesRead = scan.inputRDDs().head.partitions.length
    val allFiles = spark.read.parquet(path).inputFiles.length
    withClue(s"scan tasks $filesRead vs $allFiles total files: ") {
      filesRead should be < allFiles
    }
  }

  test("compactEpochLedger: as-of reads identical across the fold; re-runnable; later epochs land cleanly") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("ledger").toString + "/state"
    def w(rows: Seq[(String, Long)], e: Long): Unit =
      graft.streaming.EventStream.writeEpoch(
        rows.toDF("source", "consumed_tokens"), e, path)
    // keyed latest-wins history: a grows, b appears late, c writes once
    w(Seq(("a", 10L), ("c", 5L)), 0L)
    w(Seq(("a", 25L), ("b", 7L)), 1L)
    w(Seq(("b", 9L)), 2L)
    def ledger(e: Long): Map[String, Long] =
      Sinks.ledgerBeforeEpoch(spark, path, e, "source", "consumed_tokens")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    def epochDirs(): Seq[Long] = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("__epoch=")).map(_.stripPrefix("__epoch=").toLong)
        .sorted.toSeq
    }
    val before = (3L to 6L).map(e => e -> ledger(e)).toMap
    before(3L) shouldBe Map("a" -> 25L, "b" -> 9L, "c" -> 5L)

    Sinks.compactEpochLedger(spark, path, upTo = 2L, "source", "consumed_tokens")
    // one base partition remains, and every as-of read PAST the fold is
    // byte-identical to what the uncompacted history answered
    epochDirs() shouldBe Seq(2L)
    (3L to 6L).foreach(e => ledger(e) shouldBe before(e))
    // the generic readAsOfEpoch, folded the same latest-wins way, agrees
    Sinks.readAsOfEpoch(spark, path, 2L)
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct($"__epoch", $"consumed_tokens"))
        .getField("consumed_tokens").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe before(3L)
    // crash-recovery shape: the job is safely re-runnable (idempotent)
    Sinks.compactEpochLedger(spark, path, upTo = 2L, "source", "consumed_tokens")
    ledger(3L) shouldBe before(3L)
    // a post-compaction epoch folds in exactly as it would have before
    w(Seq(("a", 40L)), 3L)
    ledger(4L) shouldBe Map("a" -> 40L, "b" -> 9L, "c" -> 5L)
  }

  test("compactEpochLedger refuses a wider ledger, and detects a MIXED-schema ledger deterministically") {
    import spark.implicits._
    // uniformly wider: every file carries the extra column
    val wide = java.nio.file.Files.createTempDirectory("ledger-wide").toString + "/state"
    graft.streaming.EventStream.writeEpoch(
      Seq(("a", 10L, "x")).toDF("source", "consumed_tokens", "extra"), 0L, wide)
    val e1 = intercept[IllegalArgumentException] {
      Sinks.compactEpochLedger(spark, wide, upTo = 0L, "source", "consumed_tokens")
    }
    e1.getMessage should include("extra")
    // MIXED schema — the r18 advice case: only ONE epoch carries the extra
    // column, so a single-footer schema resolution would pass or refuse
    // depending on which file got sampled; the mergeSchema validation read
    // must see the union and refuse EVERY time
    val mixed = java.nio.file.Files.createTempDirectory("ledger-mixed").toString + "/state"
    graft.streaming.EventStream.writeEpoch(
      Seq(("a", 10L)).toDF("source", "consumed_tokens"), 0L, mixed)
    graft.streaming.EventStream.writeEpoch(
      Seq(("a", 20L, "y")).toDF("source", "consumed_tokens", "stray"), 1L, mixed)
    (1 to 3).foreach { _ =>
      val e2 = intercept[IllegalArgumentException] {
        Sinks.compactEpochLedger(spark, mixed, upTo = 1L, "source", "consumed_tokens")
      }
      e2.getMessage should include("stray")
    }
  }

  test("dropEpochsBefore: append-artifact retention deletes only strictly-older epoch directories") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("retain").toString + "/hits"
    (0L to 3L).foreach(e => graft.streaming.EventStream.writeEpoch(
      Seq((e * 10, s"v$e")).toDF("id", "v"), e, path))
    Sinks.dropEpochsBefore(spark, path, cutoff = 2L) shouldBe 2
    spark.read.parquet(path).collect()
      .map(_.getAs[Number]("__epoch").longValue()).sorted.toSeq shouldBe Seq(2L, 3L)
    // re-run: nothing left below the cutoff
    Sinks.dropEpochsBefore(spark, path, cutoff = 2L) shouldBe 0
    // a missing path is a no-op, not a crash (retention runs on a timer)
    Sinks.dropEpochsBefore(spark, path + "/nope", 5L) shouldBe 0
  }

  test("compactParquet preserves hive partition layout when told about it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact-part").toString + "/t"
    val df = (1L to 9000L).map(i => (s"p${i % 3}", i)).toDF("part", "k")
    df.repartition(10).write.partitionBy("part").parquet(dir)
    Sinks.compactParquet(spark, dir, targetFileMB = 128, partitionCols = Seq("part"))
    val back = spark.read.parquet(dir)
    // layout survived: still hive-partitioned directories, not flat files
    back.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).foreach(_ should include("part="))
    // content survived including the partition column values
    back.groupBy("part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("p0" -> 3000L, "p1" -> 3000L, "p2" -> 3000L)
  }

  test("shardedCorpus writes one sorted directory per shard, reproducibly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shard-sink").toString + "/c"
    Sinks.shardedCorpus(df, dir, "doc_id")
    val back = spark.read.parquet(dir)
    back.count() shouldBe 5000L
    // all 16 hex shards present; shard assignment matches the x56 query rule
    val byShard = back.select(col("shard").cast("int"), col("doc_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    byShard.map(_._1).toSet shouldBe (0 to 15).toSet
    byShard.foreach { case (sh, id) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      sh shouldBe Integer.parseInt(h.substring(0, 1), 16)
    }
    // within every file, rows are in md5-key order (the loader contract)
    val files = back.withColumn("f", input_file_name())
      .select(col("f"), md5(col("doc_id").cast("string")).as("k")).collect()
      .map(r => (r.getString(0), r.getString(1))).groupBy(_._1)
    files.values.foreach { rows =>
      val ks = rows.map(_._2).toSeq
      ks shouldBe ks.sorted
    }
  }

  test("sortedParquet writes disjoint key ranges per file (data-skipping layout)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = new scala.util.Random(17L)
      .shuffle((1L to 10000L).toList).map(i => (i, s"p$i")).toDF("k", "payload")
    val dir = java.nio.file.Files.createTempDirectory("sorted-sink").toString + "/t"
    Sinks.sortedParquet(df, dir, Seq("k"), numFiles = 4)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    perFile.length should be >= 2 // range partitioning actually split files
    perFile.map(_._3).sum shouldBe 10000L
    // disjoint, ordered ranges: every file's min exceeds the previous max —
    // exactly what parquet min/max stats need for whole-file skipping
    perFile.sliding(2).foreach {
      case Array((_, hiA, _), (loB, _, _)) => loB should be > hiA
      case _ =>
    }
  }
}
