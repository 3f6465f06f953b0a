package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators (SURVEY.md §2.8 + the event-shaped §2.3/§2.4/§2.5
  * rows). Every aggregation body here is a pure DataFrame => DataFrame
  * transform with no sort, so the SAME body runs under Structured Streaming
  * (readStream → transform → writeStream) — the declared batch query adds
  * only the total ordering the correctness gate needs. Streaming-mode parity
  * is asserted in scalatest via MemoryStream (StreamingParitySpec).
  *
  * Time discipline (SURVEY §1.3): `Tables.events` exposes `etime` =
  * timestamp_micros(ts div 1000) and the raw ns long `ts`. Range/asof
  * comparisons happen on *microsecond longs* on both engines, so the ns→µs
  * truncation can never flip a boundary row between Spark and DuckDB.
  */
object Events {

  /** Microsecond epoch of the event — the cross-engine comparison unit. */
  private val tsUs = expr("ts div 1000")

  // ------------------------------------------------ window aggregations

  /** 1 h tumbling window per event_type: count + sum(value). */
  def tumbling1h(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("etime"), "1 hour"), col("event_type"))
      .agg(nrows.as("n_events"), dsum(col("value"), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"), col("sum_value"))

  private def streamTumbling1h(s: SparkSession, dir: String): DataFrame =
    tumbling1h(Tables.events(s, dir)).orderBy("win_start", "event_type")

  /** 1 h windows sliding every 15 min: each event lands in 4 windows.
    * The oracle reconstructs the window set per event from the 15-min grid.
    */
  def sliding1h15m(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("etime"), "1 hour", "15 minutes"), col("event_type"))
      .agg(nrows.as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))

  private def streamSliding(s: SparkSession, dir: String): DataFrame =
    sliding1h15m(Tables.events(s, dir)).orderBy("win_start", "event_type")

  /** Session windows, 5 min inactivity gap, per user. Session end = last
    * event + gap (Spark session_window semantics, mirrored by the
    * gaps-and-islands oracle with a `>=` new-session test: session windows
    * are start-inclusive / end-exclusive).
    */
  def session5m(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("etime"), "5 minutes"), col("user_id"))
      .agg(nrows.as("n_events"), dsum(col("value"), 2).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"),
        col("sum_value"),
      )

  private def streamSession5m(s: SparkSession, dir: String): DataFrame =
    session5m(Tables.events(s, dir)).orderBy("user_id", "sess_start")

  /** Event-grain sessionization by lag/cumsum gaps-and-islands (5 min gap,
    * per user): every event labeled with its session ordinal — the form a
    * featurization pipeline consumes (the session-GRAIN rollup is
    * `stream_session_5m` via the session_window builtin; PropertySpec
    * reconciles the two). One shuffle (user_id), two window passes over it.
    * Gap tests subtract MICROSECOND longs; ties in etime break on event_id
    * in both engines.
    */
  def sessionizeLag(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("etime", "event_id")
    val pt = lag(col("etime"), 1).over(w)
    val newS = when(
      pt.isNull || unix_micros(col("etime")) - unix_micros(pt) >= 300000000L,
      1L,
    ).otherwise(0L)
    events
      .withColumn("ns", newS)
      .withColumn("session_idx", sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("etime"), col("session_idx"))
  }

  private def sessionizeLagQ(s: SparkSession, dir: String): DataFrame =
    sessionizeLag(Tables.events(s, dir)).orderBy("user_id", "event_id", "etime")

  /** Exactly-once by event_id. dropDuplicates keeps an arbitrary row, which
    * is nondeterministic under retries on ANY engine — the deterministic
    * dedup is group-by-key + min of the payload (same rule the streaming
    * variant enforces via dropDuplicatesWithinWatermark on the unique key).
    */
  def dedupById(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_id"))
      .agg(
        min(col("user_id")).as("user_id"),
        min(col("event_type")).as("event_type"),
        min(col("value")).as("value"),
      )

  private def streamDedup(s: SparkSession, dir: String): DataFrame =
    dedupById(Tables.events(s, dir)).orderBy("event_id")

  // ----------------------------------------------------- event windows

  /** Per-user inter-event gap: µs since the previous event (lag), plus the
    * next event's type (lead) — the sessionization delta primitive.
    */
  private def winLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), tsUs.as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Rolling 1 h per-user sum/count via a RANGE frame over µs longs. The
    * frame bound is numeric microseconds on BOTH engines — a time-interval
    * frame over DuckDB's TIMESTAMP_NS against Spark's ns longs could flip
    * boundary rows by sub-µs residue.
    */
  private def winRangeInterval(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), tsUs.as("ts_us"), col("value"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum", sum(col("value").cast("decimal(28,2)")).over(w).cast("double"))
      .drop("value")
      .orderBy("user_id", "ts_us", "event_id")
  }

  // ------------------------------------------------------------- pivot

  /** Event counts pivoted by event_type into columns — FIXED value list so
    * the output schema is static (deterministic columns, and the plan is a
    * single pass: pivot with known values compiles to conditional aggs).
    */
  private def aggPivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables
      .events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types
      .foldLeft(pivoted)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy("user_id")
  }

  // -------------------------------------------------------------- asof

  /** As-of join: for each purchase, the user's most recent click at-or-before
    * the purchase (µs grain). Spark has no native ASOF — the rewrite is
    * range-join candidates → row_number()=1, with a deterministic tiebreak.
    * The oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, so this query
    * cross-checks the rewrite against a reference asof implementation.
    * Clicks are pre-collapsed to one per (user, µs) — min event_id — on
    * BOTH engines: native ASOF picks an unspecified row among equal-time
    * matches, so the tie must not exist by the time it joins.
    * Scale: the candidate join is an equi-join on user_id plus a range
    * residual; the per-purchase top-1 collapses it before any further
    * exchange (same shape as win_topk_per_group).
    */
  private def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("event_type"), tsUs.as("us"))
    val p = e
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("us").as("p_us"))
    val c = e
      .filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("us").as("c_us"))
      .agg(min(col("event_id")).as("c_id"))
    val w = Window
      .partitionBy(col("p_id"))
      .orderBy(col("c_us").desc_nulls_last, col("c_id").desc)
    p.join(c, col("user_id") === col("c_user") && col("c_us") <= col("p_us"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("user_id"), col("c_id"), (col("p_us") - col("c_us")).as("wait_us"))
      .orderBy("p_id")
  }

  /** Interval join: for each view, the same user's clicks strictly after it
    * and within 30 minutes — the batch statement of a stream-stream interval
    * join (each side watermarked, join condition = equi-key + time range).
    * StreamingParitySpec re-runs this body under two MemoryStreams to assert
    * the streaming plan produces the identical pair set. Scale: an equi-join
    * on user_id with the range as a residual filter — shuffles each side
    * once by user, never builds the time cross-product.
    */
  /** The shared join body: inputs are (view_id, user_id, v_time) and
    * (click_id, c_user, c_time) with TIMESTAMP times, so the identical
    * condition drives both the batch plan and a watermarked stream-stream
    * join (Spark derives the state-eviction bound from this range).
    */
  def intervalJoin(views: DataFrame, clicks: DataFrame, joinType: String = "inner"): DataFrame =
    views
      .join(
        clicks,
        col("user_id") === col("c_user") &&
          col("c_time") > col("v_time") &&
          col("c_time") <= col("v_time") + expr("INTERVAL 30 MINUTES"),
        joinType,
      )
      .select(
        col("view_id"),
        col("click_id"),
        col("user_id"),
        (unix_micros(col("c_time")) - unix_micros(col("v_time"))).as("gap_us"),
      )

  private def joinInterval(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("event_type"), col("etime"))
    val v = e
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("etime").as("v_time"))
    val c = e
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("etime").as("c_time"))
    intervalJoin(v, c).orderBy("view_id", "click_id")
  }

  // --------------------------------------------------- binned range join

  /** 2024-01-01T00:00:00Z in µs — the fixture's event epoch. */
  private[graft] val RangeBaseUs = 1704067200000000L

  /** Bin width for joinRangeBinned: 1 hour in µs. Pick the bin comparable
    * to the TYPICAL interval length — expansion factor is
    * ceil(len/bin)+1 rows per interval (≤ 3 here).
    */
  private[graft] val RangeBinUs = 3600000000L

  /** Both formulations of the SAME pure range join (no equi key at all):
    * 60 synthesized maintenance windows (12 h apart; every 4th lasts 1 s so
    * the empty/NULL branch is real) × event timestamps.
    *
    * `naive = true` declares the textbook predicate `lo <= us < hi` — with
    * no equi-conjunct Spark can only plan BroadcastNestedLoopJoin (or a
    * cartesian), which is O(|intervals| × |events|): fine for 60 windows,
    * fatal for the millions of intervals a real calendar/campaign/outage
    * table has at 100 TB.
    *
    * `naive = false` is the scale path: explode each interval into the
    * 1-hour bins it overlaps (`sequence(lo div W, (hi-1) div W)` — hi is
    * exclusive), bin each event once (`us div W`), and join on bin EQUALITY
    * with the exact range as a residual. A point's single bin can match an
    * interval's bin list at most once, so no dedup stage is needed — the
    * residual only trims, never multiplies. The plan becomes a hash/merge
    * equi-join whose shuffle is linear in rows × expansion factor.
    * PlanInvariantsSpec pins the contrast (binned plans no
    * BroadcastNestedLoopJoin; the naive body does).
    */
  private[graft] def rangeBinnedBody(s: SparkSession, dir: String, naive: Boolean): DataFrame = {
    val w = s
      .range(60)
      .select(
        col("id").as("window_id"),
        (lit(RangeBaseUs) + col("id") * lit(43200000000L)).as("lo_us"),
        when(col("id") % 4 === 3, lit(1000000L)).otherwise(lit(5400000000L)).as("dur_us"),
      )
      .select(col("window_id"), col("lo_us"), (col("lo_us") + col("dur_us")).as("hi_us"))
    val e = Tables
      .events(s, dir)
      .select(expr("ts div 1000").as("us"), col("value"))
    val joined =
      if (naive)
        w.join(e, e("us") >= w("lo_us") && e("us") < w("hi_us"), "left")
      else {
        val wb = w.withColumn(
          "bin",
          explode(sequence(expr(s"lo_us div $RangeBinUs"), expr(s"(hi_us - 1) div $RangeBinUs"))),
        )
        val eb = e.withColumn("bin", expr(s"us div $RangeBinUs"))
        wb.join(
          eb,
          wb("bin") === eb("bin") && eb("us") >= wb("lo_us") && eb("us") < wb("hi_us"),
          "left",
        )
      }
    joined
      .groupBy("window_id", "lo_us")
      .agg(count(col("us")).as("n_events"), dsum(col("value"), 2).as("sum_value"))
      .orderBy("window_id")
  }

  private def joinRangeBinned(s: SparkSession, dir: String): DataFrame =
    rangeBinnedBody(s, dir, naive = false)

  private val joinRangeBinnedSql =
    "WITH w AS (SELECT CAST(t.range AS BIGINT) AS window_id, " +
      s"$RangeBaseUs + t.range*43200000000 AS lo_us, " +
      "CASE WHEN t.range%4=3 THEN 1000000 ELSE 5400000000 END AS dur_us FROM range(60) t), " +
      "e AS (SELECT epoch_ns(ts) // 1000 AS us, value FROM events) " +
      "SELECT w.window_id, w.lo_us, count(e.us) AS n_events, " +
      "CAST(sum(CAST(e.value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value " +
      "FROM w LEFT JOIN e ON e.us >= w.lo_us AND e.us < w.lo_us + w.dur_us " +
      "GROUP BY 1, 2 ORDER BY 1"

  /** Max concurrent sessions per day at MINUTE grain — the capacity-planning
    * question ("how many users are on at once") asked of the same 5-min
    * sessions the rest of the catalog uses. A sweep-line over session
    * boundaries needs one global sort; the minute-grid formulation shards
    * freely instead: each session explodes to the minutes it touches
    * (span-bounded, the ts_gap_fill argument), the per-minute count
    * partial-aggregates map-side, and the daily max runs over ≤1440 rows
    * per day. A user's two sessions can never share a minute (the gap is
    * ≥ 5 min), so count(*) per minute IS concurrent users. All integer
    * arithmetic + date strings.
    */
  private def tsMaxConcurrency(s: SparkSession, dir: String): DataFrame =
    sessionizeLag(Tables.events(s, dir))
      .groupBy("user_id", "session_idx")
      .agg(min("etime").as("t0"), max("etime").as("t1"))
      .select(
        col("user_id"),
        explode(
          sequence(
            date_trunc("minute", col("t0")),
            date_trunc("minute", col("t1")),
            expr("interval 1 minute"),
          )
        ).as("minute"),
      )
      .groupBy("minute")
      .agg(nrows.as("c"))
      .groupBy(date_format(col("minute"), "yyyy-MM-dd").as("day"))
      .agg(max(col("c")).as("max_concurrent"), nrows.as("n_active_minutes"))
      .orderBy("day")

  private val tsMaxConcurrencySql =
    ", s AS (SELECT user_id, sid, min(t) AS t0, max(t) AS t1 FROM g GROUP BY 1, 2), " +
      "m AS (SELECT user_id, unnest(generate_series(date_trunc('minute', t0), " +
      "date_trunc('minute', t1), INTERVAL 1 MINUTE)) AS minute FROM s), " +
      "c AS (SELECT minute, count(*) AS c FROM m GROUP BY 1) " +
      "SELECT strftime(minute, '%Y-%m-%d') AS day, max(c) AS max_concurrent, " +
      "count(*) AS n_active_minutes FROM c GROUP BY 1 ORDER BY day"

  /** Last-touch marketing attribution: each purchase is credited to the
    * user's most recent prior view/click within 7 days (ties on timestamp
    * break on event_id, both engines), purchases with no such touch go to
    * the 'direct' bucket. ONE left range join serves both buckets — the
    * touchless purchase keeps its null row, wins rank 1 under
    * DESC NULLS LAST (the default on both engines, pinned explicitly in the
    * oracle), and coalesces to 'direct' — so the dominant user-keyed range
    * join (the join_asof shape: candidates bounded per user, never a time
    * cross-product) is paid exactly once, not twice as a join + anti-join
    * re-probe would. Purchase values sum through exact DECIMAL.
    */
  private val AttrWindowUs = 7L * 86400L * 1000000L

  private def attributionLastTouch(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("etime")).as("us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("value").as("pval"), col("us").as("pus"))
    val t = e.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("tid"), col("user_id"), col("event_type").as("channel"), col("us").as("tus"))
    val w = Window
      .partitionBy("pid")
      .orderBy(col("tus").desc_nulls_last, col("tid").desc_nulls_last)
    p.as("p")
      .join(
        t.as("t"),
        col("t.user_id") === col("p.user_id") &&
          col("t.tus") <= col("p.pus") &&
          col("t.tus") > col("p.pus") - lit(AttrWindowUs),
        "left",
      )
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("pid"), col("pval"), coalesce(col("channel"), lit("direct")).as("channel"))
      .groupBy("channel")
      .agg(nrows.as("n_purchases"), round(dsum(col("pval"), 2), 4).as("attributed_value"))
      .orderBy("channel")
  }

  /** Linear (equal-credit) multi-touch attribution — the companion of
    * attribution_last_touch: every view/click in the 7-day window before a
    * purchase shares the credit equally. Credit is the integer
    * 10⁶ div n_touches per touch and value shares are pcents div n_touches
    * (truncation is part of the DEFINED statistic — deterministic in both
    * engines on these non-negative operands); no-touch purchases credit
    * 'direct' in full via the anti-join branch. Candidates are bounded per
    * user (the join_asof shape); the touch-count window partitions by
    * purchase.
    */
  private def attributionLinear(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), expr("ts div 1000").as("us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("pid"),
        col("user_id"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("pcents"),
        col("us").as("pus"),
      )
    val t = e.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("tid"), col("user_id"), col("event_type").as("channel"), col("us").as("tus"))
    val touched = p
      .join(
        t,
        p("user_id") === t("user_id") &&
          col("tus") <= col("pus") &&
          col("tus") > col("pus") - lit(AttrWindowUs),
      )
      .withColumn("n_touches", count(lit(1)).over(Window.partitionBy("pid")))
      .select(
        col("pid"),
        col("channel"),
        expr("1000000 div n_touches").as("credit_ppm"),
        expr("pcents div n_touches").as("cents_share"),
      )
    val direct = p
      .join(touched.select("pid"), Seq("pid"), "left_anti")
      .select(col("pid"), lit("direct").as("channel"), lit(1000000L).as("credit_ppm"), col("pcents").as("cents_share"))
    touched
      .unionByName(direct)
      .groupBy("channel")
      .agg(
        nrows.as("n_touches"),
        sum("credit_ppm").as("credit_ppm_sum"),
        sum("cents_share").as("attributed_cents"),
      )
      .orderBy("channel")
  }

  private val attributionLinearSql =
    "WITH e AS (SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS us FROM events), " +
      "p AS (SELECT event_id AS pid, user_id, CAST(round(value * 100, 0) AS BIGINT) AS pcents, us AS pus " +
      "FROM e WHERE event_type = 'purchase'), " +
      "t AS (SELECT event_id AS tid, user_id, event_type AS channel, us AS tus FROM e " +
      "WHERE event_type IN ('view', 'click')), " +
      "cand AS (SELECT pid, pcents, channel, " +
      "CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS n_touches " +
      "FROM p JOIN t ON t.user_id = p.user_id " +
      "AND t.tus <= p.pus AND t.tus > p.pus - 604800000000), " +
      "touched AS (SELECT pid, channel, CAST(1000000 // n_touches AS BIGINT) AS credit_ppm, " +
      "CAST(pcents // n_touches AS BIGINT) AS cents_share FROM cand), " +
      "direct AS (SELECT pid, 'direct' AS channel, CAST(1000000 AS BIGINT) AS credit_ppm, pcents AS cents_share " +
      "FROM p WHERE pid NOT IN (SELECT pid FROM touched)), " +
      "u AS (SELECT * FROM touched UNION ALL SELECT * FROM direct) " +
      "SELECT channel, CAST(count(*) AS BIGINT) AS n_touches, CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_sum, " +
      "CAST(sum(cents_share) AS BIGINT) AS attributed_cents " +
      "FROM u GROUP BY 1 ORDER BY channel"

  // ------------------------------------------------------------- catalog

  /** ONE gaps-and-islands CTE chain (5-min gap, µs-LONG gap tests per
    * SURVEY §1.3, (time, event_id) tie-break) shared by BOTH session
    * oracles below — a second hand-maintained copy of the session rule
    * would let the two drift apart and fail the PropertySpec
    * reconciliation with no hint which copy moved. Emits `g(user_id,
    * event_id, value, t, us, sid)`. The tie-break is semantically neutral
    * for session ASSIGNMENT (tied timestamps have gap 0 and always share a
    * session) but pins the lag order deterministically.
    */
  private val sessionCtePrefixSql =
    "WITH e AS (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS t, " +
      "epoch_ns(ts) // 1000 AS us FROM events), " +
      "l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pus FROM e), " +
      "f AS (SELECT *, CASE WHEN pus IS NULL OR us - pus >= 300000000 THEN 1 ELSE 0 END AS ns FROM l), " +
      "g AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM f) "

  private val attributionLastTouchSql =
    "WITH e AS (SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS us FROM events), " +
      "p AS (SELECT event_id AS pid, user_id, value AS pval, us AS pus FROM e WHERE event_type = 'purchase'), " +
      "t AS (SELECT event_id AS tid, user_id, event_type AS channel, us AS tus FROM e " +
      "WHERE event_type IN ('view', 'click')), " +
      "cand AS (SELECT pid, pval, channel, row_number() OVER " +
      "(PARTITION BY pid ORDER BY tus DESC NULLS LAST, tid DESC NULLS LAST) AS rn " +
      "FROM p LEFT JOIN t ON t.user_id = p.user_id " +
      "AND t.tus <= p.pus AND t.tus > p.pus - 604800000000), " +
      "att AS (SELECT pid, pval, coalesce(channel, 'direct') AS channel FROM cand WHERE rn = 1) " +
      "SELECT channel, count(*) AS n_purchases, " +
      "round(CAST(sum(CAST(pval AS DECIMAL(28,2))) AS DOUBLE), 4) AS attributed_value " +
      "FROM att GROUP BY 1 ORDER BY channel"

  /** Forward-fill (last-observation-carried-forward) imputation — the
    * standard time-series gap repair before feature extraction. The corpus
    * has no natural NULLs [DATA], so every 5th event's value is nulled
    * deterministically (the plant-then-repair pattern of text_pii_redact /
    * dedup_containment), then repaired with `last(ignoreNulls)` over an
    * UNBOUNDED PRECEDING row frame per user. Leading gaps (a user's first
    * events) legitimately stay NULL — both engines agree. The window
    * partitions by user_id, so at 100 TB the frame is one user's history,
    * never the corpus; `value` doubles are copied bit-exact, never
    * recomputed, so no determinism surface exists.
    */
  private def tsForwardFill(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy("etime", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("etime"),
        when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")).as("v"),
      )
      .withColumn("value_filled", last("v", ignoreNulls = true).over(w))
      .select(
        col("event_id"),
        col("user_id"),
        col("value_filled"),
        col("v").isNull.as("was_gap"),
      )
      .orderBy("event_id")
  }

  private val tsForwardFillSql =
    "WITH e AS (SELECT event_id, user_id, ts AS etime, " +
      "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v FROM events) " +
      "SELECT event_id, user_id, " +
      "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY etime, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled, " +
      "v IS NULL AS was_gap FROM e ORDER BY event_id"

  /** Exponentially weighted moving average of event values per user —
    * the feature-engineering staple (recency-weighted signal). The
    * textbook recursive form (ewma_t = αx + (1−α)ewma_{t−1}) cannot be
    * declared cross-engine (infinite memory, error accumulation), so this
    * is the K-term truncated form every feature store actually ships:
    * ewma = Σ_{k=0..8} w_k·x_{t−k} / Σ w_k over PRESENT terms, with
    * α = 1/2 so w_k = 2^−k — a pure exponent shift that scales any double
    * EXACTLY. Each product is therefore the input's bit pattern shifted,
    * and both engines evaluate the 9-term sum in the same written
    * left-to-right order (FP addition is non-associative, so neither
    * engine reassociates) — bit-identical with NO rounding grid at all,
    * the only declared double in the catalog that needs none. Truncation
    * bias vs the infinite form is ≤ 2^−9 of the weight mass, a modeling
    * constant, not an engine artifact. lag windows per user: one
    * hash(user_id) exchange at any scale.
    */
  private def winEwma(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("etime", "event_id")
    val terms = (0 to 8).map { k =>
      val x = if (k == 0) col("value") else lag(col("value"), k).over(w)
      (x, lit(math.pow(0.5, k + 1.0))) // w_k = 2^-(k+1); exact double
    }
    val num = terms.map { case (x, wk) => coalesce(x * wk, lit(0.0)) }.reduceLeft(_ + _)
    val den = terms.map { case (x, wk) => when(x.isNotNull, wk).otherwise(lit(0.0)) }.reduceLeft(_ + _)
    Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), col("etime"), col("value"))
      .withColumn("ewma", num / den)
      .select("event_id", "user_id", "value", "ewma")
      .orderBy("event_id")
  }

  private val winEwmaSql = {
    val terms = (0 to 8).map { k =>
      val x = if (k == 0) "value" else s"lag(value, $k) OVER w"
      val wk = s"power(2.0, ${-(k + 1)})"
      (x, wk)
    }
    val num = terms.map { case (x, wk) => s"coalesce(($x) * $wk, 0.0)" }.mkString(" + ")
    val den = terms.map { case (x, wk) => s"CASE WHEN ($x) IS NOT NULL THEN $wk ELSE 0.0 END" }
      .mkString(" + ")
    "SELECT event_id, user_id, value, " +
      s"($num) / ($den) AS ewma " +
      // µs grid + event_id, matching the Spark side's etime ordering (raw
      // TIMESTAMP_NS could tie-break differently for events sharing a µs)
      "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id) " +
      "ORDER BY event_id"
  }

  /** Linear gap interpolation — ts_forward_fill's higher-order sibling:
    * instead of carrying the last observation forward, a gap takes
    * vp + (vn − vp)·(t − tp)/(tn − tp) between its nearest observed
    * neighbours (the resampling primitive for sensor/metric series).
    * Same planted-gap protocol as ts_forward_fill (every 5th event's value
    * nulled [DATA]); edge gaps degrade to one-sided fill (leading → bfill,
    * trailing → ffill). Determinism WITHOUT a rounding grid, the win_ewma
    * class: both engines interpolate the identical (vp, vn, µs-integer
    * time) operands with the identically-shaped expression — one divide,
    * one multiply, one add in written order — and IEEE doubles are
    * deterministic given same operands and order; nothing here
    * reassociates. All four neighbour lookups are frames over ONE
    * (user_id)-partitioned sort — a single exchange, per-user history
    * bounded at any corpus size.
    */
  private def tsInterpolateLinear(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val frac =
      (col("tus") - col("tp")).cast("double") / (col("tn") - col("tp")).cast("double")
    Tables
      .events(s, dir)
      .select(
        col("event_id"),
        col("user_id"),
        expr("ts div 1000").as("tus"),
        when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")).as("v"),
      )
      .withColumn("vp", last("v", ignoreNulls = true).over(back))
      .withColumn("tp", last(when(col("v").isNotNull, col("tus")), ignoreNulls = true).over(back))
      .withColumn("vn", first("v", ignoreNulls = true).over(fwd))
      .withColumn("tn", first(when(col("v").isNotNull, col("tus")), ignoreNulls = true).over(fwd))
      .select(
        col("event_id"),
        col("user_id"),
        when(col("v").isNotNull, col("v"))
          .when(col("tp").isNotNull && col("tn").isNotNull, col("vp") + (col("vn") - col("vp")) * frac)
          .when(col("tp").isNotNull, col("vp"))
          .otherwise(col("vn"))
          .as("value_interp"),
        col("v").isNull.as("was_gap"),
      )
      .orderBy("event_id")
  }

  private val tsInterpolateLinearSql =
    "WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus, " +
      "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v FROM events), " +
      "n AS (SELECT event_id, user_id, tus, v, " +
      "last_value(v IGNORE NULLS) OVER wb AS vp, " +
      "last_value(CASE WHEN v IS NOT NULL THEN tus END IGNORE NULLS) OVER wb AS tp, " +
      "first_value(v IGNORE NULLS) OVER wf AS vn, " +
      "first_value(CASE WHEN v IS NOT NULL THEN tus END IGNORE NULLS) OVER wf AS tn " +
      "FROM e WINDOW " +
      "wb AS (PARTITION BY user_id ORDER BY tus, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
      "wf AS (PARTITION BY user_id ORDER BY tus, event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
      "SELECT event_id, user_id, " +
      "CASE WHEN v IS NOT NULL THEN v " +
      "WHEN tp IS NOT NULL AND tn IS NOT NULL THEN vp + (vn - vp) * (CAST(tus - tp AS DOUBLE) / CAST(tn - tp AS DOUBLE)) " +
      "WHEN tp IS NOT NULL THEN vp ELSE vn END AS value_interp, " +
      "v IS NULL AS was_gap FROM n ORDER BY event_id"

  /** OHLC downsampling — the metric/telemetry resampling verb: per
    * (event_type, hour) bucket emit open (first value), high, low, close
    * (last value) and the bucket count. Every output value is a
    * PASS-THROUGH of an input double (no arithmetic), so the hash gate
    * needs no rounding grid: open/close select one row's value via
    * row_number over the total order (etime, event_id) — ascending for
    * open, descending for close — and high/low are max/min, which compare
    * doubles without combining them. Scale shape: both row_number windows
    * and the final groupBy share the (event_type, hour) hash partitioning,
    * so the plan is one exchange + two in-partition sorts; buckets are
    * time-bounded (an hour of one event type), never corpus-sized.
    */
  private def tsDownsampleOhlc(s: SparkSession, dir: String): DataFrame = {
    val hr = date_trunc("hour", col("etime"))
    val asc = Window
      .partitionBy(col("event_type"), col("hr"))
      .orderBy(col("etime").asc, col("event_id").asc)
    val desc = Window
      .partitionBy(col("event_type"), col("hr"))
      .orderBy(col("etime").desc, col("event_id").desc)
    Tables
      .events(s, dir)
      .select(col("event_id"), col("etime"), col("event_type"), col("value"))
      .withColumn("hr", hr)
      .withColumn("ra", row_number().over(asc))
      .withColumn("rd", row_number().over(desc))
      .groupBy(col("event_type"), col("hr"))
      .agg(
        nrows.as("n_events"),
        max(when(col("ra") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rd") === 1, col("value"))).as("close"),
      )
      .orderBy("event_type", "hr")
  }

  private val tsDownsampleOhlcSql =
    "WITH e AS (SELECT event_id, ts AS etime, event_type, value, " +
      "date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr FROM events), " +
      "r AS (SELECT event_type, hr, value, " +
      "row_number() OVER (PARTITION BY event_type, hr ORDER BY etime ASC, event_id ASC) AS ra, " +
      "row_number() OVER (PARTITION BY event_type, hr ORDER BY etime DESC, event_id DESC) AS rd " +
      "FROM e) " +
      "SELECT event_type, hr, count(*) AS n_events, " +
      "max(CASE WHEN ra = 1 THEN value END) AS open, " +
      "max(value) AS high, min(value) AS low, " +
      "max(CASE WHEN rd = 1 THEN value END) AS close " +
      "FROM r GROUP BY event_type, hr ORDER BY event_type, hr"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("ts_downsample_ohlc", tsDownsampleOhlc, Some(tsDownsampleOhlcSql)),
    QueryDef("ts_interpolate_linear", tsInterpolateLinear, Some(tsInterpolateLinearSql)),
    QueryDef("win_ewma", winEwma, Some(winEwmaSql)),
    QueryDef("ts_forward_fill", tsForwardFill, Some(tsForwardFillSql)),
    QueryDef(
      "ts_max_concurrency",
      tsMaxConcurrency,
      Some(sessionCtePrefixSql + tsMaxConcurrencySql),
    ),
    QueryDef("attribution_last_touch", attributionLastTouch, Some(attributionLastTouchSql)),
    QueryDef("event_attribution_linear", attributionLinear, Some(attributionLinearSql)),
    QueryDef(
      "sessionize_lag",
      sessionizeLagQ,
      Some(
        sessionCtePrefixSql +
          "SELECT user_id, event_id, t AS etime, sid AS session_idx FROM g " +
          "ORDER BY user_id, event_id, etime"
      ),
    ),
    QueryDef(
      "join_interval",
      joinInterval,
      Some(
        "WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events), " +
          "v AS (SELECT event_id AS view_id, user_id, us AS v_us FROM e WHERE event_type = 'view'), " +
          "c AS (SELECT event_id AS click_id, user_id, us AS c_us FROM e WHERE event_type = 'click') " +
          "SELECT view_id, click_id, user_id, c_us - v_us AS gap_us " +
          "FROM v JOIN c USING (user_id) WHERE c_us > v_us AND c_us <= v_us + 1800000000 " +
          "ORDER BY view_id, click_id"
      ),
    ),
    QueryDef(
      "stream_tumbling_1h",
      streamTumbling1h,
      Some(
        "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start, event_type, " +
          "count(*) AS n_events, " +
          "CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value " +
          "FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"
      ),
    ),
    QueryDef(
      "stream_sliding",
      streamSliding,
      Some(
        "WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS us FROM events), " +
          "x AS (SELECT event_type, us, unnest(range(0, 4)) AS k FROM e), " +
          "wins AS (SELECT event_type, make_timestamp((us // 900000000) * 900000000 - k * 900000000) AS win_start " +
          "FROM x) " +
          "SELECT win_start, event_type, count(*) AS n_events FROM wins " +
          "GROUP BY 1, 2 ORDER BY win_start, event_type"
      ),
    ),
    QueryDef(
      "stream_session_5m",
      streamSession5m,
      Some(
        sessionCtePrefixSql +
          "SELECT user_id, min(t) AS sess_start, max(t) + INTERVAL 5 MINUTE AS sess_end, " +
          "count(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value " +
          "FROM g GROUP BY user_id, sid ORDER BY user_id, sess_start"
      ),
    ),
    QueryDef(
      "stream_dedup",
      streamDedup,
      Some(
        "SELECT event_id, min(user_id) AS user_id, min(event_type) AS event_type, " +
          "min(value) AS value FROM events GROUP BY event_id ORDER BY event_id"
      ),
    ),
    QueryDef(
      "win_lag_lead",
      winLagLead,
      Some(
        "SELECT event_id, user_id, event_type, ts_us, " +
          "ts_us - lag(ts_us) OVER w AS gap_us, lead(event_type) OVER w AS next_type " +
          "FROM (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events) " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id) " +
          "ORDER BY user_id, ts_us, event_id"
      ),
    ),
    QueryDef(
      "win_range_interval",
      winRangeInterval,
      Some(
        "SELECT event_id, user_id, ts_us, " +
          "count(*) OVER w AS roll_n, " +
          "CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE) AS roll_sum " +
          "FROM (SELECT event_id, user_id, value, epoch_ns(ts) // 1000 AS ts_us FROM events) " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us " +
          "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) " +
          "ORDER BY user_id, ts_us, event_id"
      ),
    ),
    QueryDef(
      "agg_pivot",
      aggPivot,
      Some(
        "SELECT user_id, " +
          "count(*) FILTER (event_type = 'click') AS click, " +
          "count(*) FILTER (event_type = 'error') AS error, " +
          "count(*) FILTER (event_type = 'purchase') AS purchase, " +
          "count(*) FILTER (event_type = 'signup') AS signup, " +
          "count(*) FILTER (event_type = 'view') AS view " +
          "FROM events GROUP BY user_id ORDER BY user_id"
      ),
    ),
    QueryDef(
      "join_asof",
      joinAsof,
      Some(
        "WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events), " +
          "p AS (SELECT event_id AS p_id, user_id, us AS p_us FROM e WHERE event_type = 'purchase'), " +
          "c AS (SELECT user_id AS c_user, us AS c_us, min(event_id) AS c_id " +
          "FROM e WHERE event_type = 'click' GROUP BY 1, 2) " +
          "SELECT p_id, user_id, c_id, p_us - c_us AS wait_us " +
          "FROM p ASOF LEFT JOIN c ON user_id = c_user AND p_us >= c_us " +
          "ORDER BY p_id"
      ),
    ),
    QueryDef("join_range_binned", joinRangeBinned, Some(joinRangeBinnedSql)),
  )
}
