package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators
  * (graft.queries.EventsQueries): the same logical shapes — tumbling-window
  * aggregation, idempotent ingest dedup, gap sessionization — expressed over
  * an unbounded source (SURVEY.md §2.1 L).
  *
  * All transforms take/return streaming DataFrames; callers pick the sink
  * via `writeStream`. State is bounded by watermarks (window agg, dedup) or
  * explicit processing-time timeouts (sessions), so executors hold O(active
  * keys) state at any scale.
  */
object EventStream {

  /** File-source ingest: tail a directory of event parquet files as an
    * unbounded stream (the batch twin is `Tables.events`). Explicit schema —
    * streaming sources cannot infer. `maxFilesPerTrigger` bounds micro-batch
    * size so a backlog of files doesn't produce one giant batch. */
  def readEvents(spark: org.apache.spark.sql.SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Hourly tumbling-window counts/sums per event type with late-data
    * tolerance — the streaming form of x15_ev_time_bucket. Watermark bounds
    * the state store; partial aggregation still happens map-side. */
  def timeBucket(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Idempotent ingest: drop replayed event_ids within the watermark horizon
    * (exactly-once-ish dedup for at-least-once sources). */
  def dedupe(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicates("event_id", "ts")

  /** Idempotent CONTENT-keyed ingest dedup (the streaming twin of the
    * x01/x09 exact-dedup path): drops re-ingested payloads whose md5
    * fingerprint was already seen within the watermark horizon. Unlike
    * `dedupe` (which trusts an upstream event_id), this derives the dedup
    * key from the payload itself — the corpus-ingestion form, where the
    * same document re-arrives under fresh ids.
    *
    * Eviction: plain `dropDuplicates("fp_md5")` would NEVER expire state —
    * watermark cleanup only applies when the event-time column is one of
    * the dedup keys — so a long-running ingest would accumulate one state
    * row per distinct payload ever seen. `dropDuplicatesWithinWatermark`
    * keys the state on the fingerprint alone but stamps each entry with its
    * event time and evicts it once the watermark passes, so executors hold
    * O(distinct payloads within the horizon), not O(corpus). Payloads
    * re-arriving after the horizon are admitted again (at-least-once dedup
    * with a bounded memory, the only contract a stream can honor). */
  def dedupeByContent(docs: DataFrame, textCol: String = "text",
      lateness: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp_md5", md5(col(textCol)))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp_md5")

  /** Streaming sketch aggregates (the streaming twin of x22): HLL++
    * distinct users per hourly window — the sketch state is a mergeable,
    * fixed-size partial aggregate, so map-side combine still applies and
    * per-window state never grows with user cardinality (exact
    * countDistinct in a stream would buffer every key). */
  def approxUsers(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.05).as("approx_users"))

  /** As-of enrichment (the streaming twin of x28_ev_asof): each streamed
    * click gets the latest view by the same user at-or-before it, from a
    * STATIC view dimension. `AsOfJoin.asOfLookup` is STATELESS (broadcast
    * dim + row-local array pick — no window over the unbounded side), so
    * the exact batch operator runs unchanged as a stream-static enrichment;
    * EventStreamSpec asserts output parity with the oracle-checked batch
    * query on the same rows. Output schema matches x28:
    * (event_id, user_id, view_event_id, gap_us). */
  def enrichClicksWithViews(clicks: DataFrame, views: DataFrame): DataFrame =
    graft.operators.AsOfJoin.asOfLookup(clicks, views,
        key = "user_id", time = "ts", rightPayload = Seq("event_id", "ts"),
        tiebreak = "event_id")
      .select(col("event_id"), col("user_id"),
        col("asof.event_id").as("view_event_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof.ts"))).as("gap_us"))

  /** Per-session rollup (the streaming twin of x46_ev_session_stats):
    * Spark's native `session_window` merges events < `gap` apart into one
    * window per (user, session) — the same gap rule as the batch query —
    * and the aggregation emits each session's event count and first-to-last
    * duration once the watermark closes it (append mode: exactly-once
    * final rows, state evicted on close). This is the built-in
    * session-window aggregation; [[sessionize]] remains the
    * flatMapGroupsWithState variant for when per-EVENT assignment is
    * needed rather than per-session rollups. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"))
      .select("user_id", "n_events", "duration_us")

  case class RollingInput(event_id: Long, user_id: Long, ts: Timestamp, cents: Long)
  case class RollingState(eventsUs: List[(Long, Long)]) // (tsMicros, cents), horizon-pruned
  case class RollingOutput(event_id: Long, user_id: Long, n_1h: Long, cents_1h: Long)

  /** Exact event-time MICROSECONDS of a Timestamp. `getTime` alone
    * truncates to milliseconds, which silently diverges from the batch
    * twins' `unix_micros` on sub-millisecond timestamps (the shipped
    * events data has them): window membership, peer detection, and gap
    * comparisons must all use the same clock as the oracle-checked batch
    * queries. */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Per-event rolling one-hour activity (the streaming twin of
    * x38_ev_rolling): each event is emitted with the count and fixed-point
    * value sum of the same user's events in the preceding hour, INCLUDING
    * same-timestamp peers — the batch RANGE frame's peer semantics.
    *
    * State per user is the event buffer inside the rolling horizon, pruned
    * each batch to `watermark − window` (a later on-time event's window
    * cannot reach below that) — executors hold O(events per user·hour),
    * the same bound the batch window's per-partition frame needs. State
    * expires via event-time timeout once the watermark passes the last
    * event + window. Same ordering contract as [[sessionize]]: exact when
    * a user's events arrive in-batch or in event-time order across
    * batches; a late straggler gets its own counts right but does not
    * retro-update rows already emitted (append mode).
    */
  def rollingActivity(events: Dataset[RollingInput], windowSeconds: Long = 3600,
      lateness: String = "10 minutes"): Dataset[RollingOutput] = {
    import events.sparkSession.implicits._
    val winUs = windowSeconds * 1000000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RollingState, RollingOutput](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[RollingInput], state: GroupState[RollingState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val buffered = state.getOption.map(_.eventsUs).getOrElse(Nil) ++
              batch.map(e => (micros(e.ts), e.cents))
            // whole batch joins the buffer BEFORE any emission so equal-ts
            // peers later in the batch count toward earlier rows (RANGE
            // frames include all peers of the current row)
            val out = batch.map { e =>
              val us = micros(e.ts)
              val inWin = buffered.filter { case (t, _) => t >= us - winUs && t <= us }
              RollingOutput(e.event_id, user, inWin.size.toLong, inWin.map(_._2).sum)
            }
            val horizon = state.getCurrentWatermarkMs() * 1000L - winUs
            val kept = buffered.filter(_._1 >= horizon)
            state.update(RollingState(kept))
            val lastMs = kept.map(_._1 / 1000L).maxOption.getOrElse(0L)
            state.setTimeoutTimestamp(
              math.max(lastMs + windowSeconds * 1000L, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  case class SessionInput(event_id: Long, user_id: Long, ts: Timestamp)
  case class SessionState(sessionId: Long, lastTsMicros: Long)
  case class SessionAssignment(event_id: Long, user_id: Long, session_id: Long)

  /** Gap-based sessionization (the streaming twin of x16_ev_sessionize):
    * events > `gapSeconds` after the previous event of the same user start a
    * new session. Custom keyed state via flatMapGroupsWithState — the Spark
    * primitive for reference-less stateful operators (SURVEY.md §7.1).
    *
    * State is BOUNDED: an event-time timeout fires once the watermark
    * (`lateness` behind max event time) passes `gapSeconds` after a user's
    * last event — at that point no on-time event can extend the session, so
    * the per-user state is removed and executors hold O(users active within
    * the gap horizon), not O(all users ever seen). A user reappearing after
    * expiry restarts the per-user session counter at 1 (the batch twin,
    * which sees all history, would keep counting — stable cross-run ids at
    * scale would key sessions by start timestamp instead).
    *
    * Within one micro-batch the group iterator is NOT time-ordered, so
    * events are sorted per key before state is applied (correct as long as a
    * user's events arrive in-batch or in order across batches; a production
    * variant would buffer a watermark's worth of events in state).
    */
  def sessionize(events: Dataset[SessionInput], gapSeconds: Long = 1800,
      lateness: String = "10 minutes"): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAssignment](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
            val out = sorted.map { e =>
              val tsMicros = micros(e.ts) // exact µs — the batch twin's clock
              val newSession = st.sessionId == 0L ||
                tsMicros - st.lastTsMicros > gapSeconds * 1000000L
              st = SessionState(if (newSession) st.sessionId + 1 else st.sessionId, tsMicros)
              SessionAssignment(e.event_id, user, st.sessionId)
            }
            state.update(st)
            // Expire once no on-time event can continue this session. The
            // timeout must sit strictly past the current watermark, so late
            // stragglers inside the allowed lateness can't set one in the past.
            val gapEndMs = st.lastTsMicros / 1000L + gapSeconds * 1000L
            state.setTimeoutTimestamp(math.max(gapEndMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
