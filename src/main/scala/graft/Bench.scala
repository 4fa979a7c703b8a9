package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Fixed deterministic calibration job: 64M `range` ids hashed and summed
    * on the session's full parallelism — no I/O, no shuffle, constant work.
    * Its wall time measures HOST capacity at that instant, so samples taken
    * through the run let a reader separate contention from regression: if
    * the calibration rows are inflated over the documented calm-window
    * value (PLANS.md "bench calibration"), every query row in the same
    * stretch is inflated by host load, not by a plan change. (Round-4
    * lesson: a loaded window recorded 23.0 s for a query that measures
    * 1.93 s calm, and nothing in the artifact could prove it was noise.) */
  def calibrate(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{bit_xor, xxhash64, col}
    val parallelism = spark.sparkContext.defaultParallelism
    val t0 = System.nanoTime()
    // bit_xor, not sum: a Long sum of 64M hashes overflows under ANSI mode
    spark.range(0L, 64L << 20, 1L, parallelism)
      .select(xxhash64(col("id")).as("h"))
      .agg(bit_xor(col("h"))).head()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: pay one-time session costs (codegen compiler, parquet
    // footer cache, JIT) outside the per-query timings.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Calibration samples: one before the loop, one after every 16th query,
    // one at the end — emitted in the JSON so a contended window is
    // self-evident from the artifact alone (compare against the calm value
    // in PLANS.md; inflated samples ⇒ inflated neighbors are host noise).
    val calibration = scala.collection.mutable.ArrayBuffer.empty[Double]
    calibrate(spark) // untimed JIT warm-up of the calibration job itself
    calibration += calibrate(spark)
    // One-time IVF index build (x17's KMeans), timed separately so the x17
    // row reflects steady-state probe cost — at cluster scale the index is
    // an amortized one-off job, not a per-query expense.
    val tIvf = System.nanoTime()
    val ivfBuild =
      try {
        graft.queries.SimilarityQueries.ivfCentroids(spark, sfDir)
        (System.nanoTime() - tIvf) / 1e9
      } catch { case e: Throwable => System.err.println(s"[bench] ivf build: $e"); -1.0 }
    // noop sink: forces full materialization of every output column
    // (count() would let Catalyst prune the projections → flattering times).
    // Each query runs three times back-to-back and reports the min —
    // steady-state cost with codegen/JIT/footer-cache noise removed AND
    // one extra sample against transient host load (the round-2 bench
    // recorded 2-4× phantom regressions from a loaded machine; min-of-3
    // makes a single slow run unable to pollute the reported number).
    // A query that throws records -1, never a partial elapsed time.
    val samples = SparkEntry.defs.zipWithIndex.map { case (q, i) =>
      if (i > 0 && i % 16 == 0) calibration += calibrate(spark)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e"); -1.0 }
      }
      q.name -> (if (times.exists(_ < 0)) Seq(-1.0) else times)
    }
    val results = samples.map { case (k, ts) => k -> ts.min }
    // Durable-index steady state: write the MinHash signature artifact once
    // (untimed — the amortized build, like the IVF KMeans above), then time
    // the probe-only dedup that reads it back — what every session after
    // the first pays instead of x03's sketch+band+verify.
    val probeOnly =
      try {
        val idx = java.nio.file.Files.createTempDirectory("bench-mh").toString + "/sigs"
        graft.queries.TextQueries.saveMinhashIndex(spark, sfDir, idx)
        val t0 = System.nanoTime()
        graft.queries.TextQueries.dedupMinhashFromIndex(spark, idx)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable => System.err.println(s"[bench] mh probe: $e"); -1.0 }
    calibration += calibrate(spark)
    println(renderJson(samples, calibration.toSeq, ivfBuild, probeOnly, sfDir))
    spark.stop()
  }

  /** Renders the one-line bench artifact. Factored out of main so
    * BenchSanitySpec can pin the artifact contract (query keys = the
    * registry, calibration + spread present) without running the queries.
    *
    * `spread` carries per-query min/max over the three runs. Read rule
    * (PLANS.md "bench calibration"): max/min ≫ 1 marks a row the host
    * contended mid-measurement — trust min. This is finer-grained than the
    * every-16th-query calibration samples, which bound a window but can
    * miss a spike between two calm probes (the round-5 x04 lesson: 13.4×
    * calm in the driver run while neighboring calibration read ≤ 0.65 s). */
  def renderJson(samples: Seq[(String, Seq[Double])], calibration: Seq[Double],
                 ivfBuild: Double, probeOnly: Double, sfDir: String): String = {
    val results = samples.map { case (k, ts) => k -> ts.min }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = samples.map { case (k, ts) =>
      f""""$k%s":{"min":${ts.min}%.3f,"max":${ts.max}%.3f}"""
    }.mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val calib = calibration.map(c => f"$c%.3f").mkString("[", ",", "]")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""spread":$spread,""" +
      s""""failed":$failed,"runs":3,"x17_index_build_sec":$ivfBuild,""" +
      s""""x03_probe_only_sec":$probeOnly,""" +
      s""""calibration_sec":$calib,""" +
      s""""calibration_job":"range64M-xxhash64-xor","sf":"$sfDir"}"""
  }
}
