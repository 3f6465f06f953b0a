package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 robust-statistics & baseline-modeling verbs: winsorized means
  * (outlier-insensitive aggregates), classical seasonal decomposition
  * (trend / seasonal / residual), and the damped-bias recommender baseline
  * (global mean + item bias + user bias — the model every CF system is
  * benchmarked against).
  *
  * Determinism doctrine (SURVEY.md §2.0): any value that feeds a later
  * reassociable sum is first rounded onto the 1e-6 DECIMAL grid (the
  * surprisal idiom) — trend before detrending, μ and item bias before the
  * user-bias sum — so every aggregate is exact decimal addition and the
  * single trailing division is the only FP step.
  *
  * Scale doctrine, per op:
  *   - agg_winsorized_mean: two passes over the fact scan — an exact
  *     percentile per group (|groups| rows, broadcast back) and one
  *     clamp+sum aggregation. At 100 TB the exact percentile would move to
  *     approx_percentile + the same clamp (the seam is one function swap).
  *   - ts_decompose_seasonal: span-bounded daily frame; the trend window
  *     is 7-ROW bounded; seasonal factors are a |types|×7 broadcast.
  *   - rec_bias_model: item stats are |items|-bounded and broadcast into
  *     the ratings scan; user grouping is the only data-scale shuffle.
  *     Each bias is a single division over exact decimal operands, so the
  *     two-stage (item-then-user) fit never chains FP error.
  */
object Robust {

  // ------------------------------------------------------------------
  // agg_winsorized_mean — p10/p90-winsorized mean per group
  // ------------------------------------------------------------------

  /** Winsorized mean of extended price per return flag: values clamp to
    * the exact [p10, p90] of their group before averaging — the robust
    * location estimate quality dashboards prefer over the raw mean.
    * Percentiles are exact interpolated (`percentile` ↔ `quantile_cont`,
    * the agg_percentile_exact pairing), rounded onto the 1e-6 grid so the
    * clamp compares both engines' values bit-identically; the clamped sum
    * is exact DECIMAL; one division per group at the end. The raw mean
    * rides along to expose the winsorization delta.
    */
  private def aggWinsorizedMean(s: SparkSession, dir: String): DataFrame = {
    val pct = Tables
      .lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.1)"), 6).as("p10"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
      )
    Tables
      .lineitem(s, dir)
      .join(broadcast(pct), "l_returnflag")
      .withColumn("wz", least(greatest(col("l_extendedprice"), col("p10")), col("p90")))
      .groupBy("l_returnflag")
      .agg(
        nrows.as("n"),
        round(sum(col("wz").cast(DecimalType(28, 6))).cast("double") / count(lit(1)), 6)
          .as("wmean"),
        round(sum(col("l_extendedprice").cast(DecimalType(28, 2))).cast("double") / count(lit(1)), 6)
          .as("rmean"),
      )
      .orderBy("l_returnflag")
  }

  private val aggWinsorizedMeanSql =
    "WITH pct AS (SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.1), 6) AS p10, " +
      "round(quantile_cont(l_extendedprice, 0.9), 6) AS p90 FROM lineitem GROUP BY 1) " +
      "SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
      "round(CAST(sum(CAST(least(greatest(l_extendedprice, p10), p90) AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS wmean, " +
      "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / count(*), 6) AS rmean " +
      "FROM lineitem l JOIN pct p ON l.l_returnflag = p.l_returnflag " +
      "GROUP BY 1 ORDER BY 1"

  // ------------------------------------------------------------------
  // ts_decompose_seasonal — trend / seasonal / residual decomposition
  // ------------------------------------------------------------------

  /** Classical additive decomposition of each event type's daily volume:
    * trend = centered 7-day moving average (row-bounded window, partial at
    * the span edges), seasonal = per-day-of-week mean of the detrended
    * series, residual = what's left. Published in EXACT integer micro-units
    * (1e-6, the ppm idiom one scale down): trend_u = Σc·10⁶ div n_win,
    * detr = c·10⁶ − trend_u, seasonal_u = Σdetr div n_dow, resid_u =
    * detr − seasonal_u — no FP anywhere, which matters because a first cut
    * published round(Σdetr/n, 6) DOUBLES and hit a genuine cross-engine
    * rounding-tie (4/150 rows off by exactly 1e-6: the two engines'
    * round() split on a .…5 quotient). Both `div` (Spark) and `//`
    * (DuckDB) truncate toward zero, including on the negative detrended
    * sums — the oracle's negative seasonal cells prove the semantics
    * match. dow is 0-based Sunday (the ts_seasonality_dow alignment).
    */
  private def tsDecomposeSeasonal(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .events(s, dir)
      .groupBy(col("event_type"), to_date(col("etime")).as("day"))
      .agg(nrows.as("c"))
    val de = daily
      .withColumn("trend_u", expr("(sum(c) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 1000000) div count(1) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"))
      .withColumn("detr", col("c") * 1000000L - col("trend_u"))
      .withColumn("dow", (dayofweek(col("day")) - 1).cast("long"))
    val se = de
      .groupBy("event_type", "dow")
      .agg(expr("sum(detr) div count(1)").as("seasonal_u"))
    de.join(broadcast(se), Seq("event_type", "dow")) // |types|×7 factor frame
      .select(
        col("event_type"),
        col("day"),
        col("c"),
        col("trend_u"),
        col("seasonal_u"),
        (col("detr") - col("seasonal_u")).as("resid_u"),
      )
      .orderBy("event_type", "day")
  }

  private val tsDecomposeSeasonalSql =
    "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c " +
      "FROM events GROUP BY 1,2), " +
      "tr AS (SELECT event_type, day, c, " +
      "CAST(CAST(sum(c) OVER w AS BIGINT) * 1000000 // CAST(count(*) OVER w AS BIGINT) AS BIGINT) AS trend_u " +
      "FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
      "de AS (SELECT *, c * 1000000 - trend_u AS detr, " +
      "CAST(dayofweek(day) AS BIGINT) AS dow FROM tr), " +
      "se AS (SELECT event_type, dow, CAST(CAST(sum(detr) AS BIGINT) // count(*) AS BIGINT) AS seasonal_u " +
      "FROM de GROUP BY 1, 2) " +
      "SELECT d.event_type, d.day, d.c, d.trend_u, s.seasonal_u, " +
      "CAST(d.detr - s.seasonal_u AS BIGINT) AS resid_u " +
      "FROM de d JOIN se s ON d.event_type = s.event_type AND d.dow = s.dow " +
      "ORDER BY d.event_type, d.day"

  // ------------------------------------------------------------------
  // rec_bias_model — damped global/item/user bias baseline
  // ------------------------------------------------------------------

  /** The recommender bias baseline (μ + bᵢ + bᵤ with damping λ = 10) over
    * implicit ratings r = l_quantity on (customer, part): the model every
    * collaborative filter is benchmarked against, fit in two closed-form
    * passes. Published in EXACT integer micro-units end-to-end — ratings
    * scale to r·10⁶ once, then μ, every bᵢ, and every bᵤ are truncating
    * integer divisions (`div`/`//`, both toward zero) of exact BIGINT
    * sums. A first cut rounded double divisions to 6 decimals and hit
    * cross-engine rounding ties (5/1500 users off by exactly 1e-6); in
    * micro-units the fit chains two stages with zero FP anywhere, so ties
    * cannot exist. The 1-unit truncation bias per division is model noise
    * (λ already dwarfs it), not an accuracy loss.
    */
  private val Damping = 10

  private def recBiasModel(s: SparkSession, dir: String): DataFrame = {
    val r = Tables
      .lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(
        col("o_custkey").as("u"),
        col("l_partkey").as("i"),
        round(col("l_quantity") * 1000000L, 0).cast("long").as("ru"),
      )
    val g = r.agg(expr("sum(ru) div count(1)").as("mu_u"))
    val ib = r
      .groupBy("i")
      .agg(nrows.as("n_i"), sum(col("ru")).as("sr_u"))
      .crossJoin(broadcast(g)) // 1-row global mean
      .select(
        col("i"),
        expr(s"(sr_u - n_i * mu_u) div ($Damping + n_i)").as("bi_u"),
      )
    r.join(broadcast(ib), "i") // |items|-bounded bias table
      .crossJoin(broadcast(g))
      .groupBy("u")
      .agg(nrows.as("n_u"), sum(col("ru") - col("mu_u") - col("bi_u")).as("st_u"))
      .select(
        col("u").as("custkey"),
        col("n_u").as("n_ratings"),
        expr(s"st_u div ($Damping + n_u)").as("bu_u"),
      )
      .orderBy("custkey")
  }

  private val recBiasModelSql =
    "WITH r AS (SELECT o_custkey AS u, l_partkey AS i, " +
      "CAST(round(l_quantity * 1000000, 0) AS BIGINT) AS ru " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
      "g AS (SELECT CAST(CAST(sum(ru) AS BIGINT) // count(*) AS BIGINT) AS mu_u FROM r), " +
      s"ib AS (SELECT i, CAST(CAST(sum(ru) AS BIGINT) - count(*) * mu_u AS BIGINT) // ($Damping + count(*)) AS bi_u " +
      "FROM r, g GROUP BY i, mu_u), " +
      "ub AS (SELECT u, CAST(count(*) AS BIGINT) AS n_u, " +
      "CAST(sum(ru - mu_u - bi_u) AS BIGINT) AS st_u " +
      "FROM r JOIN ib USING (i), g GROUP BY u) " +
      s"SELECT u AS custkey, n_u AS n_ratings, CAST(st_u // ($Damping + n_u) AS BIGINT) AS bu_u " +
      "FROM ub ORDER BY custkey"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("agg_winsorized_mean", aggWinsorizedMean, Some(aggWinsorizedMeanSql)),
    QueryDef("ts_decompose_seasonal", tsDecomposeSeasonal, Some(tsDecomposeSeasonalSql)),
    QueryDef("rec_bias_model", recBiasModel, Some(recBiasModelSql)),
  )
}
