package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo,
  GroupState,
  GroupStateTimeout,
  OutputMode,
  StatefulProcessor,
  StreamingQuery,
  TimeMode,
  TimerValues,
  Trigger,
  TTLConfig,
  ValueState,
}

/** True Structured Streaming surface (SURVEY.md §2.8): the batch bodies in
  * `Events` run unchanged on streams; this module adds what only exists in
  * streaming — watermarks, stateful processing, streaming dedup, and the
  * checkpointed append sink. StreamingParitySpec drives everything through
  * MemoryStream and asserts batch↔streaming parity and watermark semantics.
  */
object Streaming {

  /** An event as the streaming specs feed it (mirrors the events table with
    * etime already materialized).
    */
  final case class Ev(event_id: Long, etime: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

  /** Watermarked tumbling window: events later than `delay` behind the max
    * seen event time are dropped once the watermark passes their window —
    * the late-data policy Glue streaming jobs get from Spark.
    */
  def tumblingWithWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("etime", delay)
      .groupBy(window(col("etime"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))

  /** Streaming exactly-once dedup on the unique key within the watermark
    * horizon (state is bounded by the watermark, unlike batch distinct).
    */
  def dedupWithinWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("etime", delay).dropDuplicatesWithinWatermark("event_id")

  /** Streaming exact-dedup BY CONTENT — the streaming analog of the batch
    * `dedup_exact_norm`: arriving docs are deduped on md5 of normalized
    * text within the watermark horizon, so a curation pipeline can ingest
    * continuously instead of re-scanning the corpus. State is one 32-byte
    * digest per distinct doc inside the horizon (never the text), the same
    * text-stays-map-side property as the batch op.
    */
  def dedupContentWithinWatermark(docs: DataFrame, delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("norm_md5", md5(Text.normText(col("text"))))
      .withWatermark("etime", delay)
      .dropDuplicatesWithinWatermark("norm_md5")

  /** Running per-user event counters across micro-batches via explicit
    * state (mapGroupsWithState) — the custom-state escape hatch when
    * windowed aggs can't express the logic. Final state ≡ batch
    * groupBy(user).count, asserted in spec.
    */
  def statefulUserCount(events: Dataset[Ev]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Ev], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + batch.size
          state.update(next)
          (user, next)
      }
  }

  /** Per-user running (count, sum) via the 4.x `transformWithState` API —
    * the successor to mapGroupsWithState: explicit named state handles,
    * TTL support, timers. Requires the RocksDB state store provider
    * (spec sets it). Final state ≡ batch groupBy count/sum.
    */
  final case class UserTotals(user_id: Long, n: Long, total: Double)

  class RunningTotalsProcessor extends StatefulProcessor[Long, Ev, UserTotals] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE,
      )

    override def handleInputRows(user: Long, rows: Iterator[Ev], timerValues: TimerValues): Iterator[UserTotals] = {
      val (n0, s0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0
      var s = s0
      rows.foreach { e => n += 1; s += e.value }
      totals.update((n, s))
      Iterator.single(UserTotals(user, n, s))
    }
  }

  def statefulRunningTotals(events: Dataset[Ev]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalsProcessor,
        TimeMode.None(),
        OutputMode.Update(),
        implicitly[org.apache.spark.sql.Encoder[UserTotals]],
      )
  }

  /** Idle-session detection via EVENT-TIME TIMERS — the transformWithState
    * capability nothing else in §2.8 exercises: per-user state plus a timer
    * re-registered at (last event time + gap); when the WATERMARK passes an
    * un-superseded timer, `handleExpiredTimer` fires exactly once, emits the
    * closed session, and clears state. Sessions can ALSO close inside
    * `handleInputRows`: an arriving event more than `gap` past the open
    * session's last event closes that session immediately (and a single
    * batch's events are walked in event-time order, splitting within-batch
    * runs the same way) — without this, output would depend on whether the
    * closing event beat the timer to the state store, i.e. on micro-batch
    * boundaries rather than event time. Watermark-driven timers make the
    * idle path deterministic under MemoryStream (no wall clock), and at
    * scale the state store holds one (count, last) pair per OPEN session —
    * closed sessions leave the store, so state is bounded by concurrent
    * activity, not history. This is the push-based complement to the
    * pull-based sessionize_lag / session_window rollups. (Known limit,
    * shared with every timer sessionizer: an event that arrives LATE —
    * within the watermark horizon but older than the open session's last
    * event — joins that session rather than retro-splitting history.)
    */
  final case class ClosedSession(user_id: Long, n_events: Long, last_ms: Long)

  class IdleSessionProcessor(gapMs: Long) extends StatefulProcessor[Long, Ev, ClosedSession] {
    @transient private var sess: ValueState[(Long, Long)] = _ // (count, lastEventMs)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long)](
        "sess",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE,
      )

    override def handleInputRows(
        user: Long,
        rows: Iterator[Ev],
        timerValues: TimerValues,
    ): Iterator[ClosedSession] = {
      val (n0, last0) = if (sess.exists()) sess.get() else (0L, 0L)
      var n = n0
      var last = last0
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      // event-time order so within-batch gaps split exactly like the batch
      // sessionizers; a micro-batch's per-key slice is small by definition
      rows.toSeq.sortBy(_.etime.getTime).foreach { e =>
        val t = e.etime.getTime
        if (last > 0L && t > last + gapMs) {
          closed += ClosedSession(user, n, last)
          n = 0L
        }
        n += 1
        last = math.max(last, t)
      }
      // supersede the previous deadline: one live timer per open session
      if (last0 > 0L) getHandle.deleteTimer(last0 + gapMs)
      getHandle.registerTimer(last + gapMs)
      sess.update((n, last))
      closed.iterator
    }

    override def handleExpiredTimer(
        user: Long,
        timerValues: TimerValues,
        expired: ExpiredTimerInfo,
    ): Iterator[ClosedSession] = {
      val out =
        if (sess.exists()) {
          val (n, last) = sess.get()
          Iterator.single(ClosedSession(user, n, last))
        } else Iterator.empty
      sess.clear()
      out
    }
  }

  /** The 5-minute gap matches stream_session_5m / sessionize_lag. */
  val IdleGapMs: Long = 5L * 60L * 1000L

  /** `delay` is the out-of-order tolerance, like every watermark op here
    * (specs pass "0 seconds" for deterministic timer firing; production
    * streams want slack — timers just fire `delay` later).
    */
  def idleSessionDetector(events: Dataset[Ev], delay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("etime", delay)
      .groupByKey(_.user_id)
      .transformWithState(
        new IdleSessionProcessor(IdleGapMs),
        TimeMode.EventTime(),
        OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[ClosedSession]],
      )
  }

  /** Watermarked stream-stream interval join — the canonical two-stream
    * correlation (impression ⋈ click, request ⋈ response): a right-side
    * event joins every left-side event of the same user whose time is in
    * (r_time − horizon, r_time]. BOTH inputs carry watermarks and the join
    * condition carries the time bound — the combination Structured
    * Streaming requires to bound state in append mode: the left buffer
    * holds only rows younger than (right watermark − horizon), the right
    * buffer only rows the left watermark hasn't passed, so an unbounded
    * two-stream join runs forever at fixed memory. Without the time bound
    * Spark must buffer one side indefinitely — the classic streaming-join
    * OOM at corpus scale. StreamingParitySpec pins result ≡ the identical
    * batch join and that both state stores stay watermark-bounded.
    */
  def intervalJoinStreams(
      left: DataFrame, // (user_id, l_id, l_time)
      right: DataFrame, // (user_id, r_id, r_time)
      horizon: String = "30 minutes",
      delay: String = "10 minutes",
  ): DataFrame = {
    val l = left.withWatermark("l_time", delay).alias("l")
    val r = right.withWatermark("r_time", delay).alias("r")
    l.join(
        r,
        expr(
          s"l.user_id = r.user_id AND r_time >= l_time AND r_time < l_time + INTERVAL $horizon"
        ),
      )
      .select(
        col("l.user_id").as("user_id"),
        col("l_id"),
        col("l_time"),
        col("r_id"),
        col("r_time"),
      )
  }

  /** Windowed agg → append-mode parquet sink with checkpoint: the
    * fault-tolerant file-sink pattern (results commit exactly once per
    * window close).
    */
  def startAppendSink(agg: DataFrame, path: String, checkpoint: String): StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start(path)

  /** foreachBatch merge sink: the escape hatch for sinks Structured
    * Streaming has no native writer for (upserts, JDBC, multi-table fanout).
    * Each micro-batch anti-joins the target's existing keys and appends only
    * new ones — an idempotent insert-if-absent merge, so replayed batches
    * (at-least-once delivery after a restart) cannot duplicate rows. The
    * checkpoint makes batch ids durable; the anti-join makes the write
    * idempotent even across checkpoint loss. At scale the target key read
    * prunes to the join columns only (parquet column pruning).
    */
  def startForeachBatchUpsert(events: DataFrame, target: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // probe the target by reading it: works on any filesystem scheme
        // (local/HDFS/object store), and treats an existing-but-fileless
        // directory (crash between mkdir and commit) as absent
        val fresh = scala.util
          .Try(s.read.parquet(target).select("event_id"))
          .map(existing => batch.join(existing, Seq("event_id"), "left_anti"))
          .getOrElse(batch)
        fresh.dropDuplicates("event_id").write.mode("append").parquet(target)
        ()
      }
      .start()

  /** Drive any streaming Dataset to completion into a named memory sink and
    * return the sink contents (spec helper; Complete mode for aggregations,
    * Append for row streams).
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
