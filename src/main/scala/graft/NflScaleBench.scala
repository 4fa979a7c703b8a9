package graft

import org.apache.spark.sql.SparkSession

import graft.nfl.{NflPipeline, NflSynth}

/** Scale bench for the reference-parity pipeline itself (the join/window
  * workload the TPC-H-ish queries don't cover): generates synthetic
  * tracking distributedly, runs DL→MB end-to-end, prints one JSON line.
  *
  * `runMain graft.NflScaleBench [nGames] [playsPerGame]` — defaults 50×60 =
  * 3000 plays = 600k tracking rows; 5000×60 ≈ 60M rows for a soak.
  */
object NflScaleBench {
  def main(args: Array[String]): Unit = {
    val nGames = if (args.length > 0) args(0).toInt else 50
    val playsPerGame = if (args.length > 1) args(1).toInt else 60
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the ScaleLadder lesson (r14, PLANS.md): an N×-scale shuffle into a
      // 1×-sized partition count concentrates per-task window/aggregate
      // state until it OOMs — let AQE size reduce stages by bytes, so the
      // 1000× rung keeps enough partitions while small runs coalesce back
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", 16 * cpus.toInt)
      // r18: the 1000× rung is DISK-bound on this host (shuffle spill +
      // the persisted frame tables exceed the ~75 GiB free even after the
      // width prune) — trade CPU for disk exactly as a disk-tight cluster
      // would: zstd for shuffle/spill streams (~1.5-2× denser than the
      // lz4 default) and compressed serialized RDD cache blocks
      .config("spark.io.compression.codec", "zstd")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pipeline = new NflPipeline(
      NflSynth.tracking(spark, nGames, playsPerGame),
      NflSynth.pff(spark, nGames, playsPerGame),
      NflSynth.plays(spark, nGames, playsPerGame),
      NflSynth.players(spark))

    val t0 = System.nanoTime()
    val trackingRows = nGames.toLong * playsPerGame * 10 * 20
    val nFinal = pipeline.rushersFinal.count()
    val tMetric = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val nBlockers = pipeline.blockersWithMetric.count()
    val nThrow = pipeline.timeToThrow.count()
    val tRest = (System.nanoTime() - t1) / 1e9
    println(s"""{"metric":"nfl_pipeline","tracking_rows":$trackingRows,""" +
      s""""rushers_final":$nFinal,"blockers":$nBlockers,"time_to_throw":$nThrow,""" +
      s""""metric_sec":$tMetric,"downstream_sec":$tRest}""")
    spark.stop()
  }
}
