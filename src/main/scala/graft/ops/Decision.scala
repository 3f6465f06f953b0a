package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 6 — decision-science verbs: model-calibration reporting,
  * the Welch two-sample t-test, exact weighted median, the Theil–Sen
  * robust trend estimator, and funnel time-to-convert latency percentiles.
  *
  * Determinism doctrine (SURVEY.md §2.0): counts/sums ride exact int64
  * (money and `value` on the cent grid); every declared double is either a
  * single division of exact int64 operands or an identical closed-form
  * expression tree over such divisions (IEEE ops on identical inputs are
  * bit-identical cross-engine); signed rounded doubles go through
  * [[graft.Qf.zround]].
  *
  * Scale doctrine, per op:
  *   - ml_eval_calibration: one fact-scan aggregation to the |bins|=11
  *     score grid — map-side combine does all the work, output is tiny.
  *   - stats_welch_ttest: ONE conditional-aggregation pass to a 1-row
  *     moment frame (n/Σ/Σ² per arm); no shuffle beyond the single
  *     partial-agg exchange, any corpus size.
  *   - agg_weighted_median: cumulative-weight windows partitioned by
  *     p_type over the |part| frame; at 100 TB the documented seam is the
  *     binned form (cum weights on a price grid, same shape as
  *     stats_ks_test) — exact selection only needs the grid cell that
  *     crosses half-weight.
  *   - stats_theil_sen_trend: pair generation is |days|² per region on the
  *     SPAN-BOUNDED daily frame (≤366² — fixed by the calendar year, not
  *     corpus size); the fact scan reaches day grain via one map-side
  *     combined aggregation first.
  *   - funnel_time_to_convert: per-user min-reductions (natural event-log
  *     partitioning), then a |cohort|-bounded percentile window over the
  *     |users| frame; at 100 TB swap the exact positional percentile for
  *     the binned-latency form, same seam as the weighted median.
  */
object Decision {

  // ------------------------------------------------------------------
  // ml_eval_calibration — reliability curve of a score vs outcome
  // ------------------------------------------------------------------

  /** Calibration (reliability-curve) report: treat the discount level as a
    * model score predicting returns (score s ∈ {0..10} ⇒ predicted
    * probability s/10), the actual outcome as `l_returnflag = 'R'`, and
    * report per score bin the support, predicted vs observed rate (both in
    * ppm) and the signed calibration gap. This is the evaluation table
    * every probabilistic classifier ships with; all arithmetic is exact
    * int64 (observed rate via integer ppm division), so the report is
    * bit-stable cross-engine.
    */
  private def mlEvalCalibration(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .select(
        expr("CAST(round(l_discount * 100, 0) AS BIGINT)").as("score_pct"),
        (col("l_returnflag") === "R").cast("long").as("hit"),
      )
      .groupBy("score_pct")
      .agg(nrows.as("n"), sum("hit").as("n_pos"))
      .select(
        col("score_pct"),
        col("n"),
        col("n_pos"),
        (col("score_pct") * 100000L).as("pred_ppm"),
        expr("n_pos * 1000000 div n").as("obs_ppm"),
        (col("score_pct") * 100000L - expr("n_pos * 1000000 div n")).as("gap_ppm"),
      )
      .orderBy("score_pct")

  private val mlEvalCalibrationSql =
    "WITH b AS (SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS score_pct, " +
      "CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos " +
      "FROM lineitem GROUP BY 1) " +
      "SELECT score_pct, n, n_pos, " +
      "CAST(score_pct * 100000 AS BIGINT) AS pred_ppm, " +
      "CAST(n_pos * 1000000 // n AS BIGINT) AS obs_ppm, " +
      "CAST(score_pct * 100000 - n_pos * 1000000 // n AS BIGINT) AS gap_ppm " +
      "FROM b ORDER BY score_pct"

  // ------------------------------------------------------------------
  // stats_welch_ttest — unequal-variance two-sample t-test
  // ------------------------------------------------------------------

  /** Welch's unequal-variance t-test between the `click` and `error`
    * event arms on `value` (cents grid): one conditional-aggregation pass
    * collects exact int64 moments (n, Σv, Σv²) per arm, then t and the
    * Welch–Satterthwaite df are the textbook closed forms evaluated in
    * double over those exact integers — the identical expression tree on
    * identical inputs yields bit-identical IEEE results in both engines.
    * Sample variance uses the E[X²]−E[X]² form so no integer product can
    * overflow at any sf (all products live in double space).
    */
  // Welch SE terms, shared VERBATIM between the Spark plan and the oracle
  // so both engines evaluate the identical IEEE expression tree:
  // vk = (qk/nk − (sk/nk)²)·nk/(nk−1)/nk (sample variance of arm k over nk).
  // Squares are spelled x*x, not pow(x,2) — pow is not guaranteed
  // correctly rounded and may differ by an ULP between libm and the JVM.
  private val welchV1 =
    "((q1 / CAST(n1 AS DOUBLE)) - (s1 / CAST(n1 AS DOUBLE)) * (s1 / CAST(n1 AS DOUBLE))) * n1 / (n1 - 1.0) / n1"
  private val welchV2 =
    "((q2 / CAST(n2 AS DOUBLE)) - (s2 / CAST(n2 AS DOUBLE)) * (s2 / CAST(n2 AS DOUBLE))) * n2 / (n2 - 1.0) / n2"
  private val welchT =
    s"((s1 / CAST(n1 AS DOUBLE)) - (s2 / CAST(n2 AS DOUBLE))) / sqrt($welchV1 + $welchV2)"
  private val welchDf =
    s"($welchV1 + $welchV2) * ($welchV1 + $welchV2) / " +
      s"(($welchV1) * ($welchV1) / (n1 - 1.0) + ($welchV2) * ($welchV2) / (n2 - 1.0))"

  private def statsWelchTtest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .filter(col("event_type").isin("click", "error"))
      .select(
        (col("event_type") === "click").cast("long").as("g1"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("v"),
      )
    val m = e.agg(
      sum("g1").as("n1"),
      sum(lit(1L) - col("g1")).as("n2"),
      sum(col("g1") * col("v")).as("s1"),
      sum((lit(1L) - col("g1")) * col("v")).as("s2"),
      sum(col("g1") * col("v") * col("v")).as("q1"),
      sum((lit(1L) - col("g1")) * col("v") * col("v")).as("q2"),
    )
    m.select(
      col("n1"),
      col("n2"),
      round(expr("s1 / n1 / 100.0"), 4).as("mean1"),
      round(expr("s2 / n2 / 100.0"), 4).as("mean2"),
      zround(round(expr(welchT), 4)).as("t_stat"),
      round(expr(welchDf), 2).as("df_welch"),
    )
  }

  private val statsWelchTtestSql =
    "WITH e AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1, " +
      "CAST(round(value * 100, 0) AS BIGINT) AS v FROM events " +
      "WHERE event_type IN ('click', 'error')), " +
      "m AS (SELECT CAST(sum(g1) AS BIGINT) AS n1, CAST(sum(1 - g1) AS BIGINT) AS n2, " +
      "CAST(sum(g1 * v) AS BIGINT) AS s1, CAST(sum((1 - g1) * v) AS BIGINT) AS s2, " +
      "CAST(sum(g1 * v * v) AS BIGINT) AS q1, CAST(sum((1 - g1) * v * v) AS BIGINT) AS q2 FROM e) " +
      "SELECT n1, n2, round(s1 / n1 / 100.0, 4) AS mean1, round(s2 / n2 / 100.0, 4) AS mean2, " +
      s"CASE WHEN round($welchT, 4) = 0 THEN 0.0 ELSE round($welchT, 4) END AS t_stat, " +
      s"round($welchDf, 2) AS df_welch " +
      "FROM m"

  // ------------------------------------------------------------------
  // agg_weighted_median — exact weighted percentile selection
  // ------------------------------------------------------------------

  /** Exact weighted median of part retail price per type, weighted by
    * `p_size`: the smallest price whose cumulative weight reaches half the
    * total (2·cum ≥ total in integers — no halving division). The
    * cumulative window orders by (price, partkey) so ties resolve
    * deterministically; because cum is monotone along that order, the
    * selection is a plain conditional MIN, no positional lookup. The
    * declared median is a raw stored double — no arithmetic touches it.
    */
  private def aggWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    // per-type running weight + type total via ScaleRank (the
    // win_pareto_share algebra): each type's whole part list no longer
    // sorts in one window task
    val base = Tables
      .part(s, dir)
      .select(col("p_type"), col("p_partkey"), col("p_retailprice"), col("p_size").cast("long").as("wt"))
    ScaleRank
      .rankedFrame(base, Seq("p_type"), Seq(col("p_retailprice"), col("p_partkey")), Some("wt"))
      .groupBy("p_type")
      .agg(
        nrows.as("n_parts"),
        max("__seg_sum").as("total_weight"),
        min(when(col("__cum") * 2 >= col("__seg_sum"), col("p_retailprice"))).as("wmedian_price"),
      )
      .orderBy("p_type")
  }

  private val aggWeightedMedianSql =
    "WITH c AS (SELECT p_type, p_retailprice, " +
      "CAST(sum(p_size) OVER (PARTITION BY p_type ORDER BY p_retailprice, p_partkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
      "CAST(sum(p_size) OVER (PARTITION BY p_type) AS BIGINT) AS tot FROM part) " +
      "SELECT p_type, CAST(count(*) AS BIGINT) AS n_parts, max(tot) AS total_weight, " +
      "min(CASE WHEN cum * 2 >= tot THEN p_retailprice END) AS wmedian_price " +
      "FROM c GROUP BY p_type ORDER BY p_type"

  // ------------------------------------------------------------------
  // stats_theil_sen_trend — robust slope via median of pairwise slopes
  // ------------------------------------------------------------------

  /** Theil–Sen robust trend of daily 1998 order volume per region: the
    * median over all day pairs (i < j) of slope (c_j − c_i)/(k_j − k_i),
    * where k is the epoch-day index. Breakdown point 29% — outlier days
    * that wreck OLS leave this slope alone. Each pairwise slope is one
    * double division of exact int64 deltas; the median interpolates two
    * such doubles at most (Spark `percentile` ≡ DuckDB `quantile_cont`).
    * The pair stream is generated from the SPAN-BOUNDED daily frame
    * (≤366 days/region ⇒ ≤67k pairs/region — fixed by the calendar, not
    * the corpus), never from order grain.
    */
  private def statsTheilSenTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .orders(s, dir)
      .filter(col("o_orderdate") >= "1998-01-01" && col("o_orderdate") < "1999-01-01")
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("rk"), datediff(to_date(col("o_orderdate")), lit("1998-01-01")).as("k"))
      .agg(nrows.as("c"))
    val a = daily.select(col("rk"), col("k").as("k1"), col("c").as("c1"))
    val b = daily.select(col("rk").as("rk2"), col("k").as("k2"), col("c").as("c2"))
    a.join(b, col("rk") === col("rk2") && col("k2") > col("k1"))
      .select(col("rk"), ((col("c2") - col("c1")).cast("double") / (col("k2") - col("k1")).cast("double")).as("slope"))
      .groupBy("rk")
      .agg(
        count(lit(1)).as("n_pairs"),
        zround(round(expr("percentile(slope, 0.5)"), 4)).as("trend_per_day"),
      )
      .withColumn("region_key", col("rk").cast("long"))
      .select(col("region_key"), col("n_pairs"), col("trend_per_day"))
      .orderBy("region_key")
  }

  private val statsTheilSenTrendSql =
    "WITH daily AS (SELECT n_regionkey AS rk, " +
      "date_diff('day', DATE '1998-01-01', CAST(o_orderdate AS DATE)) AS k, " +
      "CAST(count(*) AS BIGINT) AS c " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE o_orderdate >= '1998-01-01' AND o_orderdate < '1999-01-01' GROUP BY 1, 2), " +
      "p AS (SELECT a.rk, CAST(b.c - a.c AS DOUBLE) / CAST(b.k - a.k AS DOUBLE) AS slope " +
      "FROM daily a JOIN daily b ON a.rk = b.rk AND b.k > a.k) " +
      "SELECT CAST(rk AS BIGINT) AS region_key, CAST(count(*) AS BIGINT) AS n_pairs, " +
      "CASE WHEN round(quantile_cont(slope, 0.5), 4) = 0 THEN 0.0 " +
      "ELSE round(quantile_cont(slope, 0.5), 4) END AS trend_per_day " +
      "FROM p GROUP BY rk ORDER BY region_key"

  // ------------------------------------------------------------------
  // funnel_time_to_convert — view→purchase latency percentiles
  // ------------------------------------------------------------------

  /** Time-to-convert funnel latency: per user, the first `view` and the
    * first `purchase` strictly after it; latencies cohorted by the
    * day-of-week of the first view (0 = Sunday — the Spark `dayofweek`−1 ≡
    * DuckDB `dayofweek` alignment) with conversion rate and positional
    * (type-1 discrete) latency percentiles. All time arithmetic runs on
    * the µs grid (`ts div 1000` ≡ DuckDB `epoch_ns(ts)//1000` under either
    * events encoding); p50/p90 are exact order statistics picked at
    * row_number position ceil(q·n) over (latency, user) order — value AT
    * the position via monotone conditional MAX, so ties are benign.
    */
  private def funnelTimeToConvert(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
    val v = e.filter(col("event_type") === "view").groupBy("user_id").agg(min("us").as("tv"))
    val p = e
      .filter(col("event_type") === "purchase")
      .join(v, Seq("user_id"))
      .filter(col("us") > col("tv"))
      .groupBy("user_id", "tv")
      .agg(min("us").as("tp"))
      .select(
        col("user_id"),
        expr("(tp - tv) div 1000000").as("latency_s"),
        (dayofweek(expr("timestamp_micros(tv)")) - 1).cast("long").as("cohort_dow"),
      )
    // per-cohort latency rank + cohort size via ScaleRank — the r6 plan's
    // 7 cohort window tasks each held |users|/7 rows; the percentile
    // selection algebra is unchanged (type-1 positional at ceil(q·n))
    ScaleRank
      .rankedFrame(p, Seq("cohort_dow"), Seq(col("latency_s"), col("user_id")), None)
      .groupBy("cohort_dow")
      .agg(
        nrows.as("n_converted"),
        max(when(col("__rn") <= expr("(__seg_n + 1) div 2"), col("latency_s"))).as("p50_latency_s"),
        max(when(col("__rn") <= expr("(__seg_n * 9 + 9) div 10"), col("latency_s"))).as("p90_latency_s"),
      )
      .orderBy("cohort_dow")
  }

  private val funnelTimeToConvertSql =
    "WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events), " +
      "v AS (SELECT user_id, min(us) AS tv FROM e WHERE event_type = 'view' GROUP BY 1), " +
      "pu AS (SELECT e.user_id, v.tv, min(e.us) AS tp FROM e JOIN v ON e.user_id = v.user_id " +
      "WHERE e.event_type = 'purchase' AND e.us > v.tv GROUP BY 1, 2), " +
      "l AS (SELECT user_id, (tp - tv) // 1000000 AS latency_s, " +
      "CAST(dayofweek(make_timestamp(tv)) AS BIGINT) AS cohort_dow FROM pu), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY cohort_dow ORDER BY latency_s, user_id) AS rn, " +
      "count(*) OVER (PARTITION BY cohort_dow) AS n FROM l) " +
      "SELECT cohort_dow, CAST(count(*) AS BIGINT) AS n_converted, " +
      "CAST(max(CASE WHEN rn <= (n + 1) // 2 THEN latency_s END) AS BIGINT) AS p50_latency_s, " +
      "CAST(max(CASE WHEN rn <= (n * 9 + 9) // 10 THEN latency_s END) AS BIGINT) AS p90_latency_s " +
      "FROM r GROUP BY cohort_dow ORDER BY cohort_dow"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("ml_eval_calibration", mlEvalCalibration, Some(mlEvalCalibrationSql)),
    QueryDef("stats_welch_ttest", statsWelchTtest, Some(statsWelchTtestSql)),
    QueryDef("agg_weighted_median", aggWeightedMedian, Some(aggWeightedMedianSql)),
    QueryDef("stats_theil_sen_trend", statsTheilSenTrend, Some(statsTheilSenTrendSql)),
    QueryDef("funnel_time_to_convert", funnelTimeToConvert, Some(funnelTimeToConvertSql)),
  )
}
