package graft.nfl

import org.apache.spark.sql.Dataset

/** Typed views of the pipeline intermediates (SURVEY.md §1.3/§7.1): the
  * DataFrame stays the workhorse, but stage boundaries expose `Dataset[T]`
  * so downstream code gets compile-time column checking where it helps.
  */
package object model {

  /** MB:22-30 play bounds row. */
  case class PlayBound(playId: Long, gameId: Long, frameId: Int)

  /** MB:56-58 QB set point. */
  case class SetPoint(
      nflId_QB: Long, playId: Long, gameId: Long,
      frameId: Int, x_set_point: Double, y_set_point: Double)

  /** MB:99-104 per-rusher-play metric core (label columns omitted). */
  case class RusherPlayMetric(
      playId: Long, gameId: Long, nflId: Long,
      snap: Double, playEnd: Double, Pressure_Start: Double,
      Seconds: Double, Distance: Double,
      Percent_to_Pressure_Zone: Double, Percent_to_Pressure_Zone_per_s: Double)

  /** WIP:73-77 time-to-throw row. */
  case class ThrowTiming(
      playId: Long, gameId: Long, nflId: Long,
      snap: Double, throwTime: Double, yards: Int, seconds_to_throw: Double)

  implicit class NflTypedOps(private val p: NflPipeline) {

    def setPointsDs: Dataset[SetPoint] = {
      val spark = p.setPoints.sparkSession
      import spark.implicits._
      p.setPoints.as[SetPoint]
    }

    def metricDs: Dataset[RusherPlayMetric] = {
      val spark = p.metric.sparkSession
      import spark.implicits._
      p.metric.select(
        "playId", "gameId", "nflId", "snap", "playEnd", "Pressure_Start",
        "Seconds", "Distance", "Percent_to_Pressure_Zone",
        "Percent_to_Pressure_Zone_per_s").as[RusherPlayMetric]
    }

    def timeToThrowDs: Dataset[ThrowTiming] = {
      val spark = p.timeToThrow.sparkSession
      import spark.implicits._
      p.timeToThrow.withColumnRenamed("throw", "throwTime").as[ThrowTiming]
    }
  }
}
