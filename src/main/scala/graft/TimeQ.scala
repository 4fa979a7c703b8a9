package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop timing harness: min-of-3 warm noop-write timings for registry
  * queries matching the given name prefixes, on an arbitrary sf dir —
  * `runMain graft.TimeQ /root/testdata/sf0.1 x149 x153`. The full
  * [[Bench]] stays the round artifact; this exists so a plan change can be
  * measured in ~1 min without paying the 181-query sweep (it was the tool
  * that caught the lmScoreCore checkpoint+count variant costing x66
  * 2.1 s → 4.2 s before it shipped). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = args.drop(1)
    // honor SPARK_GRAFT_CPUS exactly as Bench does — timings from this
    // harness pre-screen Bench rows, so the parallelism must match
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("OFF")
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    for (q <- SparkEntry.defs if prefixes.exists(p => q.name.startsWith(p))) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] ${q.name}: min ${ts.min}%.2f s  (runs: ${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
