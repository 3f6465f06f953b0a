package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-5 data-mining & feature-engineering verbs: association rules
  * (market-basket lift), incremental aggregate maintenance, Markov event
  * transitions, smoothed target encoding, time-series autocorrelation, and
  * period-over-period rank movers. Determinism per SURVEY.md §2.0
  * throughout (exact DECIMAL sums, integer-ppm rates, single-division
  * doubles over identical integer operands).
  *
  * Scale doctrine, per op:
  *   - market_basket_lift: the pair fan-out is bounded by BASKET size
  *     (max 13 items/order here, bounded in any real order stream), never
  *     corpus² — the self-join is an equi-join on l_orderkey, so cost is
  *     Σ |basket|² over orders, linear in order count. Item supports are
  *     |parts|-bounded and broadcast back to the pair frame.
  *   - agg_incremental_merge: the whole point at 100 TB — yesterday's
  *     aggregate STATE (|groups| rows of exact-DECIMAL partials) merges
  *     with today's delta partials instead of rescanning history. Decimal
  *     addition is associative/exact, so merge ≡ recompute bit-for-bit
  *     (the oracle IS the full recompute).
  *   - event_transition_probs: one lead() pass over the user partitioning,
  *     then a |types|²-bounded count frame; transition totals broadcast.
  *   - feature_target_encode: category stats are |categories|-bounded; the
  *     global prior is a 1-row broadcast (the tf-idf N pattern).
  *   - ts_autocorr_daily: daily counts are span-bounded (|days| rows per
  *     type), the lag pairing rides the per-type window, and the Pearson r
  *     is closed-form double arithmetic over exact BIGINT moments
  *     (agg_corr_exact pattern).
  *   - win_rank_movers: the rank windows run over the |brands|-bounded
  *     revenue frame (25 rows — the unpartitioned Window is deliberate and
  *     bounded), after a brand-grain pre-aggregation of the fact scan.
  */
object Mining {

  // ------------------------------------------------------------------
  // market_basket_lift — association rules over order baskets
  // ------------------------------------------------------------------

  /** Frequent co-purchased part pairs with support/confidence/lift. Baskets
    * are orders; items enter per-basket DISTINCT (one (order, part) row per
    * item). Pairs with n_ab >= 3 survive (min-support prune AFTER the
    * basket-bounded pair count — the count itself is the cheap part).
    * lift = N·n_ab / (n_a·n_b) and confidence = n_ab / n_a are single
    * double divisions of exact BIGINT products (all < 2^53, exactly
    * representable), so both engines emit identical bytes.
    */
  private val MinPairSupport = 3

  private def marketBasketLift(s: SparkSession, dir: String): DataFrame = {
    // scale path (r15): the raw-row distinct is the last spilling stage at
    // sf10 — sized like the pair aggregate below (byte-gated, see
    // Modeling.sizedDistinct)
    val items = Modeling.sizedDistinct(
      s, dir, Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")))
    // 1-row total-baskets frame, broadcast via crossJoin (the tf-idf N pattern)
    val tot = items.agg(countDistinct(col("l_orderkey")).as("n_total"))
    val supp = items.groupBy("l_partkey").agg(nrows.as("n_item"))
    val joined = items
      .as("a")
      .join(
        items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"),
      )
      .select(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
    // scale path (r15): above the byte gate, spread the basket-pair
    // aggregate over work-proportional partitions (r14 measured this key at
    // 10.6× on a 10× decade — the graph keys' spill wall, one decade out)
    val pairs = Modeling
      .basketPairAggPartitions(s, dir)
      .map(n => joined.repartition(n, col("part_a"), col("part_b")))
      .getOrElse(joined)
      .groupBy("part_a", "part_b")
      .agg(nrows.as("n_ab"))
      .filter(col("n_ab") >= MinPairSupport)
    pairs
      .join(broadcast(supp.withColumnRenamed("n_item", "n_a")), col("part_a") === col("l_partkey"))
      .drop("l_partkey")
      .join(broadcast(supp.withColumnRenamed("n_item", "n_b")), col("part_b") === col("l_partkey"))
      .drop("l_partkey")
      .crossJoin(broadcast(tot))
      .select(
        col("part_a"),
        col("part_b"),
        col("n_ab"),
        col("n_a"),
        col("n_b"),
        round((col("n_ab") * col("n_total")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6).as("confidence"),
      )
      .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
  }

  private val marketBasketLiftSql =
    "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
      "tot AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM items), " +
      "supp AS (SELECT l_partkey, count(*) AS n_item FROM items GROUP BY 1), " +
      "pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab " +
      "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
      s"GROUP BY 1, 2 HAVING count(*) >= $MinPairSupport) " +
      "SELECT part_a, part_b, n_ab, sa.n_item AS n_a, sb.n_item AS n_b, " +
      "round(CAST(n_ab * n_total AS DOUBLE) / CAST(sa.n_item * sb.n_item AS DOUBLE), 6) AS lift, " +
      "round(CAST(n_ab AS DOUBLE) / CAST(sa.n_item AS DOUBLE), 6) AS confidence " +
      "FROM pairs JOIN supp sa ON part_a = sa.l_partkey " +
      "JOIN supp sb ON part_b = sb.l_partkey CROSS JOIN tot " +
      "ORDER BY n_ab DESC, part_a, part_b"

  // ------------------------------------------------------------------
  // agg_incremental_merge — aggregate-state maintenance ≡ recompute
  // ------------------------------------------------------------------

  /** Incremental aggregate maintenance: per-flag partial aggregates of the
    * history (shipdate < cutoff) merge with the delta's partials (>= cutoff)
    * by plain re-aggregation — counts add, exact-DECIMAL sums add — and the
    * result is bit-identical to a full recompute (which is what the oracle
    * runs). The partials stay DECIMAL until AFTER the merge; only the final
    * merged value casts to double, so no precision is lost at the seam.
    */
  private val MergeCutoff = "2000-01-01"

  private def aggIncrementalMerge(s: SparkSession, dir: String): DataFrame = {
    val d = DecimalType(28, 2)
    def partial(rows: DataFrame): DataFrame =
      rows
        .groupBy("l_returnflag")
        .agg(
          nrows.as("n"),
          sum(col("l_quantity").cast(d)).as("sq"),
          sum(col("l_extendedprice").cast(d)).as("sp"),
        )
    val li = Tables.lineitem(s, dir)
    val cut = lit(MergeCutoff).cast("timestamp")
    val state = partial(li.filter(col("l_shipdate") < cut))
    val delta = partial(li.filter(col("l_shipdate") >= cut))
    state
      .unionByName(delta)
      .groupBy("l_returnflag")
      .agg(
        sum("n").as("n_rows"),
        sum("sq").cast("double").as("sum_qty"),
        sum("sp").cast("double").as("sum_price"),
      )
      .orderBy("l_returnflag")
  }

  private val aggIncrementalMergeSql =
    "SELECT l_returnflag, count(*) AS n_rows, " +
      "CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price " +
      "FROM lineitem GROUP BY 1 ORDER BY 1"

  // ------------------------------------------------------------------
  // event_transition_probs — Markov transition matrix over event types
  // ------------------------------------------------------------------

  /** First-order Markov transition counts and probabilities between
    * consecutive event types per user (ordered by microsecond time with
    * event_id as the deterministic tiebreak — SURVEY §1.3/§2.0). The
    * probability is integer ppm (n·10⁶ div n_from) so the declared value
    * is exact in both engines.
    */
  private def eventTransitionProbs(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), expr("ts div 1000").as("us"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val tr = e
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(nrows.as("n"))
    val totals = tr.groupBy("from_type").agg(sum("n").as("n_from"))
    tr.join(broadcast(totals), "from_type") // |types| rows
      .select(
        col("from_type"),
        col("to_type"),
        col("n"),
        col("n_from"),
        expr("n * 1000000 div n_from").as("p_ppm"),
      )
      .orderBy("from_type", "to_type")
  }

  private val eventTransitionProbsSql =
    "WITH tr AS (SELECT event_type AS from_type, " +
      "lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id) AS to_type " +
      "FROM events), " +
      "cnt AS (SELECT from_type, to_type, count(*) AS n FROM tr " +
      "WHERE to_type IS NOT NULL GROUP BY 1, 2), " +
      "tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM cnt GROUP BY 1) " +
      "SELECT c.from_type, c.to_type, c.n, t.n_from, c.n * 1000000 // t.n_from AS p_ppm " +
      "FROM cnt c JOIN tot t USING (from_type) ORDER BY from_type, to_type"

  // ------------------------------------------------------------------
  // feature_target_encode — smoothed categorical target encoding
  // ------------------------------------------------------------------

  /** Leakage-aware categorical feature encoding: per-market-segment rate of
    * finished orders, shrunk toward the global prior with additive
    * smoothing (alpha = 10 pseudo-observations at the prior rate) — the
    * standard high-cardinality-category treatment before model training.
    * All rates are integer ppm, so the smoothing arithmetic
    * (n_pos·10⁶ + α·prior_ppm) div (n + α) is exact cross-engine.
    */
  private val EncodeAlpha = 10

  private def featureTargetEncode(s: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(s, dir)
      .select(col("o_custkey"), (col("o_orderstatus") === "F").cast("long").as("pos"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    val seg = o
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(nrows.as("n"), sum("pos").as("n_pos"))
    val prior = seg
      .agg(sum("n").as("n_tot"), sum("n_pos").as("pos_tot"))
      .select(expr("pos_tot * 1000000 div n_tot").as("prior_ppm"))
    seg
      .crossJoin(broadcast(prior)) // 1-row global prior
      .select(
        col("c_mktsegment"),
        col("n"),
        col("n_pos"),
        expr("n_pos * 1000000 div n").as("rate_ppm"),
        col("prior_ppm"),
        expr(s"(n_pos * 1000000 + $EncodeAlpha * prior_ppm) div (n + $EncodeAlpha)")
          .as("smoothed_ppm"),
      )
      .orderBy("c_mktsegment")
  }

  private val featureTargetEncodeSql =
    "WITH j AS (SELECT c_mktsegment, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos " +
      "FROM orders JOIN customer ON o_custkey = c_custkey), " +
      "seg AS (SELECT c_mktsegment, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos " +
      "FROM j GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot, CAST(sum(n_pos) AS BIGINT) AS pos_tot FROM seg), " +
      "pr AS (SELECT pos_tot * 1000000 // n_tot AS prior_ppm FROM tot) " +
      "SELECT c_mktsegment, n, n_pos, n_pos * 1000000 // n AS rate_ppm, prior_ppm, " +
      s"(n_pos * 1000000 + $EncodeAlpha * prior_ppm) // (n + $EncodeAlpha) AS smoothed_ppm " +
      "FROM seg CROSS JOIN pr ORDER BY c_mktsegment"

  // ------------------------------------------------------------------
  // ts_autocorr_daily — lag-1 autocorrelation of daily volumes
  // ------------------------------------------------------------------

  /** Lag-1 Pearson autocorrelation of each event type's daily volume
    * series — the seasonality/trend screen before forecasting. Consecutive
    * days pair via lead() over the per-type window (gap days drop out via
    * the datediff = 1 guard); r comes from exact BIGINT moments with
    * closed-form double arithmetic (agg_corr_exact pattern — built-in corr
    * accumulates doubles in partial-agg order and cannot hash-match).
    */
  private def tsAutocorrDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .events(s, dir)
      .groupBy(col("event_type"), to_date(col("etime")).as("day"))
      .agg(nrows.as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val pairs = daily
      .withColumn("day_next", lead("day", 1).over(w))
      .withColumn("c_next", lead("c", 1).over(w))
      .filter(col("c_next").isNotNull && datediff(col("day_next"), col("day")) === 1)
    val m = pairs
      .groupBy("event_type")
      .agg(
        nrows.as("n"),
        sum("c").as("sx"),
        sum("c_next").as("sy"),
        sum(col("c") * col("c")).as("sxx"),
        sum(col("c_next") * col("c_next")).as("syy"),
        sum(col("c") * col("c_next")).as("sxy"),
      )
    m.select(
      col("event_type"),
      col("n"),
      round(
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
        4,
      ).as("autocorr_lag1"),
    ).orderBy("event_type")
  }

  private val tsAutocorrDailySql =
    "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c " +
      "FROM events GROUP BY 1, 2), " +
      "p AS (SELECT event_type, c, day, " +
      "lead(day) OVER (PARTITION BY event_type ORDER BY day) AS day_next, " +
      "lead(c) OVER (PARTITION BY event_type ORDER BY day) AS c_next FROM daily), " +
      "pairs AS (SELECT event_type, c, c_next FROM p " +
      "WHERE c_next IS NOT NULL AND day_next - day = 1), " +
      "m AS (SELECT event_type, count(*) AS n, sum(c) AS sx, sum(c_next) AS sy, " +
      "sum(c * c) AS sxx, sum(c_next * c_next) AS syy, sum(c * c_next) AS sxy " +
      "FROM pairs GROUP BY 1) " +
      "SELECT event_type, n, round(CAST(n * sxy - sx * sy AS DOUBLE) / " +
      "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4) " +
      "AS autocorr_lag1 FROM m ORDER BY event_type"

  // ------------------------------------------------------------------
  // win_rank_movers — period-over-period revenue rank change
  // ------------------------------------------------------------------

  /** Brand revenue league table movement: 1999 vs 2000 net revenue per
    * brand, each period ranked by revenue (brand tiebreak), and the rank
    * delta reported. Revenue is the exact-DECIMAL dsum of
    * price·(1−discount) (scale 4 — product of two 2-decimal values), so
    * period ranks order identical doubles in both engines.
    * BOUNDED WINDOW: the two row_number windows are unpartitioned by design
    * — they run over the |brands|-sized revenue frame (25 rows), never the
    * fact table.
    */
  private def winRankMovers(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables
      .lineitem(s, dir)
      .filter(year(col("l_shipdate")).isin(1999, 2000))
      .join(Tables.part(s, dir).select("p_partkey", "p_brand"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("rev"))
    def ranked(yr: Int, revName: String, rankName: String): DataFrame =
      rev
        .filter(col("yr") === yr)
        .select(
          col("p_brand"),
          col("rev").as(revName),
          asLong(row_number().over(Window.orderBy(col("rev").desc, col("p_brand")))).as(rankName),
        )
    ranked(1999, "rev_prev", "rank_prev")
      .join(ranked(2000, "rev_curr", "rank_curr"), "p_brand")
      .select(
        col("p_brand"),
        col("rev_prev"),
        col("rev_curr"),
        col("rank_prev"),
        col("rank_curr"),
        (col("rank_prev") - col("rank_curr")).as("rank_delta"),
      )
      .orderBy("p_brand")
  }

  private val winRankMoversSql =
    "WITH rev AS (SELECT p_brand, year(l_shipdate) AS yr, " +
      "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS rev " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE year(l_shipdate) IN (1999, 2000) GROUP BY 1, 2), " +
      "prev AS (SELECT p_brand, rev AS rev_prev, " +
      "CAST(row_number() OVER (ORDER BY rev DESC, p_brand) AS BIGINT) AS rank_prev " +
      "FROM rev WHERE yr = 1999), " +
      "curr AS (SELECT p_brand, rev AS rev_curr, " +
      "CAST(row_number() OVER (ORDER BY rev DESC, p_brand) AS BIGINT) AS rank_curr " +
      "FROM rev WHERE yr = 2000) " +
      "SELECT p_brand, rev_prev, rev_curr, rank_prev, rank_curr, " +
      "rank_prev - rank_curr AS rank_delta " +
      "FROM prev JOIN curr USING (p_brand) ORDER BY p_brand"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("market_basket_lift", marketBasketLift, Some(marketBasketLiftSql)),
    QueryDef("agg_incremental_merge", aggIncrementalMerge, Some(aggIncrementalMergeSql)),
    QueryDef("event_transition_probs", eventTransitionProbs, Some(eventTransitionProbsSql)),
    QueryDef("feature_target_encode", featureTargetEncode, Some(featureTargetEncodeSql)),
    QueryDef("ts_autocorr_daily", tsAutocorrDaily, Some(tsAutocorrDailySql)),
    QueryDef("win_rank_movers", winRankMovers, Some(winRankMoversSql)),
  )
}
