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
    // the cluster posture lives in ONE place — NflPipeline.scaleConf —
    // shared by this bench and any real deployment (r18 verdict item 5);
    // each setting's rationale is documented there
    val builder = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
    val spark = NflPipeline.scaleConf(cpus.toInt)
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
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
