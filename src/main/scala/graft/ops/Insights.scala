package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 distribution-analytics verbs: corpus-mix entropy, spend
  * concentration (Gini), item-item collaborative-filtering neighborhoods,
  * CUSUM changepoint detection, and day-of-week seasonality profiling.
  * Determinism per SURVEY.md §2.0 throughout: per-term `round(·, 6)` onto
  * the DECIMAL grid before any reassociable sum, integer-ppm rates, and
  * single double divisions over exact BIGINT operands.
  *
  * Scale doctrine, per op:
  *   - agg_entropy_mix: the (source, lang) count frame is
  *     |sources|×|langs|-bounded; per-source totals broadcast back. One
  *     corpus scan, map-side combine.
  *   - agg_gini_spend: spend pre-aggregates to customer grain (cents as
  *     exact BIGINT) before the per-nation rank window, so the window runs
  *     over |customers| rows, never |orders|; at 100 TB the i·x Σ would
  *     move to DECIMAL(38) partials — the seam is one cast.
  *   - recs_item_neighbors: the pair fan-out is bounded by basket size
  *     (the market_basket_lift argument — Σ |basket|² over orders, never
  *     items²); supports broadcast; the per-item rank window runs on the
  *     min-support-pruned pair frame.
  *   - ts_changepoint_cusum: daily counts are span-bounded (|days| rows
  *     per type); the CUSUM statistic n·prefix − k·total is all-BIGINT so
  *     the argmax is exact, no FP boundary.
  *   - ts_seasonality_dow: |types|×7 output; totals broadcast.
  *   - event_ltv_deciles: events pre-aggregate to user grain before the
  *     decile window; 100 TB seam = two-stage quantile cut (noted at the
  *     window site).
  *   - win_pareto_share: revenue pre-aggregates to customer grain; the
  *     rank/cum windows run per segment over |customers| rows.
  */
object Insights {

  // ------------------------------------------------------------------
  // agg_entropy_mix — Shannon entropy of the language mix per source
  // ------------------------------------------------------------------

  /** Corpus-diversity diagnostic: Shannon entropy (bits) of each source's
    * language distribution — the standard mix-health check before choosing
    * per-domain sampling weights. Each lang's term −p·log2(p) rounds to 6
    * decimals onto the DECIMAL grid (the surprisal idiom: ln is the only
    * engine-dependent step and the 1e-6 grid absorbs any ULP drift), then
    * the per-source sum is exact decimal addition. log2 is spelled
    * ln(p)/ln(2) on BOTH sides — Spark's log(base, x) and DuckDB's log2
    * would otherwise disagree in the last ulp more often than raw ln.
    */
  private def aggEntropyMix(s: SparkSession, dir: String): DataFrame = {
    val c = Tables
      .documents(s, dir)
      .groupBy("source", "lang")
      .agg(nrows.as("c"))
    val t = c.groupBy("source").agg(sum("c").as("n"), nrows.as("n_langs"))
    val p = col("c").cast("double") / col("n").cast("double")
    c.join(broadcast(t), "source") // |sources| rows
      .select(
        col("source"),
        col("n"),
        col("n_langs"),
        round(-p * log(p) / log(lit(2.0)), 6).cast(DecimalType(18, 6)).as("s6"),
      )
      .groupBy("source")
      .agg(
        min("n").as("n_docs"),
        min("n_langs").as("n_langs"),
        sum(col("s6")).cast("double").as("entropy_bits"),
      )
      .orderBy("source")
  }

  private val aggEntropyMixSql =
    "WITH c AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2), " +
      "t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_langs FROM c GROUP BY 1), " +
      "s AS (SELECT c.source, t.n, t.n_langs, " +
      "CAST(round(-(CAST(c.c AS DOUBLE) / t.n) * ln(CAST(c.c AS DOUBLE) / t.n) / ln(2), 6) " +
      "AS DECIMAL(18,6)) AS s6 FROM c JOIN t USING (source)) " +
      "SELECT source, min(n) AS n_docs, min(n_langs) AS n_langs, " +
      "CAST(sum(s6) AS DOUBLE) AS entropy_bits FROM s GROUP BY 1 ORDER BY source"

  // ------------------------------------------------------------------
  // agg_gini_spend — Gini coefficient of customer spend per nation
  // ------------------------------------------------------------------

  /** Spend-concentration index per nation: the Gini coefficient of
    * customer lifetime spend, G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with x
    * ascending. Spend is exact integer cents (round(price·100) — 2-decimal
    * money, no tie ambiguity), every moment is BIGINT, and the one double
    * division at the end is over int64 operands both engines cast
    * identically. Rank ties (equal cents) don't perturb Σi·xᵢ — swapping
    * equal x across ranks leaves the sum unchanged — but the custkey
    * tiebreak keeps the window itself deterministic.
    */
  private def aggGiniSpend(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables
      .orders(s, dir)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
    val j = spend.join(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey").as("nationkey")),
      col("o_custkey") === col("c_custkey"),
    )
    // per-nation spend rank via ScaleRank — a populous nation's whole
    // customer list no longer sorts in one window task (r7 hub discipline)
    ScaleRank
      .rankedFrame(
        j.select(col("nationkey"), col("o_custkey"), col("cents")),
        Seq("nationkey"),
        Seq(col("cents"), col("o_custkey")),
        None,
      )
      .groupBy("nationkey")
      .agg(nrows.as("n"), sum("cents").as("sx"), sum(col("__rn") * col("cents")).as("sxi"))
      .select(
        col("nationkey"),
        col("n").as("n_cust"),
        col("sx").as("total_cents"),
        round(
          (lit(2) * col("sxi") - (col("n") + 1) * col("sx")).cast("double") /
            (col("n") * col("sx")).cast("double"),
          6,
        ).as("gini"),
      )
      .orderBy("nationkey")
  }

  private val aggGiniSpendSql =
    "WITH spend AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) " +
      "AS BIGINT) AS cents FROM orders GROUP BY 1), " +
      "j AS (SELECT c_nationkey AS nationkey, o_custkey, cents " +
      "FROM spend JOIN customer ON o_custkey = c_custkey), " +
      "r AS (SELECT nationkey, cents, CAST(row_number() OVER " +
      "(PARTITION BY nationkey ORDER BY cents, o_custkey) AS BIGINT) AS i FROM j), " +
      "m AS (SELECT nationkey, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sx, " +
      "CAST(sum(i * cents) AS BIGINT) AS sxi FROM r GROUP BY 1) " +
      "SELECT nationkey, n AS n_cust, sx AS total_cents, " +
      "round(CAST(2 * sxi - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE), 6) AS gini " +
      "FROM m ORDER BY nationkey"

  // ------------------------------------------------------------------
  // recs_item_neighbors — item-item CF neighborhoods (cosine on baskets)
  // ------------------------------------------------------------------

  /** Top-5 most-similar items per item, cosine-normalized co-purchase —
    * the item-item collaborative-filtering neighborhood table. Shares the
    * basket-bounded pair-count skeleton with market_basket_lift but is a
    * different artifact: symmetric per-item neighbor lists under cosine
    * (n_ab / √n_a·√n_b) with an exact jaccard_ppm companion. sqrt, ·, and
    * / are each single correctly-rounded IEEE ops over exact int64 inputs,
    * so the unrounded cosine is already bit-identical cross-engine; the
    * rank window then orders the round(6) value (the declared grid) with
    * an nbr tiebreak, so both engines cut the same top-5.
    */
  private val MinNeighborSupport = 3
  private val NeighborsK = 5

  private def recsItemNeighbors(s: SparkSession, dir: String): DataFrame = {
    // scale path (r15): sized raw-row distinct (byte-gated — see
    // Modeling.sizedDistinct)
    val items = Modeling.sizedDistinct(
      s, dir, Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")))
    val supp = items.groupBy("l_partkey").agg(nrows.as("n_i"))
    // basket-size cap (the hub cap for order-keyed pair fan-out): a basket
    // of b items explodes b² pairs, so one degenerate mega-order would own
    // one task's runtime; baskets need >= 2 items to pair at all and
    // baskets above the cap are dropped from pair generation on BOTH
    // engines (Modeling.PairDegreeCap doc; TPC-H orders hold <= 7 items,
    // so declared outputs are unchanged). Item support for the cosine/
    // jaccard denominators stays computed on the FULL item set.
    val bounded = items
      .join(Modeling.pairableKeys(items, "l_orderkey", Modeling.PairDegreeCap), Seq("l_orderkey"), "left_semi")
    val joined = bounded
      .as("a")
      .join(
        bounded.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"),
      )
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
    // scale path (r15): size the basket-pair aggregate to the work above
    // the byte gate — see Modeling.basketPairAggPartitions
    val pairs = Modeling
      .basketPairAggPartitions(s, dir)
      .map(n => joined.repartition(n, col("pa"), col("pb")))
      .getOrElse(joined)
      .groupBy("pa", "pb")
      .agg(nrows.as("n_ab"))
      .filter(col("n_ab") >= MinNeighborSupport)
    val sym = pairs
      .select(col("pa").as("item"), col("pb").as("nbr"), col("n_ab"))
      .unionByName(pairs.select(col("pb").as("item"), col("pa").as("nbr"), col("n_ab")))
    val scored = sym
      .join(broadcast(supp.select(col("l_partkey").as("item"), col("n_i").as("n_item"))), "item")
      .join(broadcast(supp.select(col("l_partkey").as("nbr"), col("n_i").as("n_nbr"))), "nbr")
      .withColumn(
        "cosine",
        round(
          col("n_ab").cast("double") /
            (sqrt(col("n_item").cast("double")) * sqrt(col("n_nbr").cast("double"))),
          6,
        ),
      )
      .withColumn(
        "jaccard_ppm",
        expr("n_ab * 1000000 div (n_item + n_nbr - n_ab)"),
      )
    val w = Window.partitionBy("item").orderBy(col("cosine").desc, col("nbr"))
    scored
      .withColumn("rk", asLong(row_number().over(w)))
      .filter(col("rk") <= NeighborsK)
      .select(col("item"), col("nbr"), col("n_ab"), col("cosine"), col("jaccard_ppm"), col("rk"))
      .orderBy("item", "rk")
  }

  private val recsItemNeighborsSql =
    "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
      "supp AS (SELECT l_partkey, count(*) AS n_i FROM items GROUP BY 1), " +
      "okord AS (SELECT l_orderkey FROM items GROUP BY 1 " +
      s"HAVING count(*) >= 2 AND count(*) <= ${Modeling.PairDegreeCap}), " +
      "bi AS (SELECT items.l_orderkey, items.l_partkey FROM items JOIN okord USING (l_orderkey)), " +
      "pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab " +
      "FROM bi a JOIN bi b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
      s"GROUP BY 1, 2 HAVING count(*) >= $MinNeighborSupport), " +
      "sym AS (SELECT pa AS item, pb AS nbr, n_ab FROM pairs " +
      "UNION ALL SELECT pb, pa, n_ab FROM pairs), " +
      "sc AS (SELECT item, nbr, n_ab, " +
      "round(CAST(n_ab AS DOUBLE) / (sqrt(CAST(sa.n_i AS DOUBLE)) * sqrt(CAST(sb.n_i AS DOUBLE))), 6) AS cosine, " +
      "n_ab * 1000000 // (sa.n_i + sb.n_i - n_ab) AS jaccard_ppm " +
      "FROM sym JOIN supp sa ON item = sa.l_partkey JOIN supp sb ON nbr = sb.l_partkey), " +
      "rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY item ORDER BY cosine DESC, nbr) " +
      "AS BIGINT) AS rk FROM sc) " +
      s"SELECT item, nbr, n_ab, cosine, jaccard_ppm, rk FROM rk WHERE rk <= $NeighborsK " +
      "ORDER BY item, rk"

  // ------------------------------------------------------------------
  // ts_changepoint_cusum — integer CUSUM changepoint per event type
  // ------------------------------------------------------------------

  /** The day each event type's volume regime most plausibly shifted: the
    * argmax over k of the CUSUM statistic |Σ₁..k c − k·mean|. Scaled by n
    * to stay integral — score(k) = |n·prefix_k − k·total| — so the whole
    * statistic is exact BIGINT arithmetic and the argmax has no FP
    * boundary at all. Ties break to the earliest day.
    */
  private def tsChangepointCusum(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .events(s, dir)
      .groupBy(col("event_type"), to_date(col("etime")).as("day"))
      .agg(nrows.as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val tot = daily.groupBy("event_type").agg(sum("c").as("total"), nrows.as("n_days"))
    val scored = daily
      .withColumn("k", asLong(row_number().over(w)))
      .withColumn("pre", sum("c").over(w))
      .join(broadcast(tot), "event_type") // |types| rows
      .withColumn("score", abs(col("n_days") * col("pre") - col("k") * col("total")))
    val pick = Window.partitionBy("event_type").orderBy(col("score").desc, col("day"))
    scored
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(
        col("event_type"),
        col("n_days"),
        col("total").as("n_events"),
        col("day").as("cp_day"),
        col("score").as("cp_score"),
      )
      .orderBy("event_type")
  }

  private val tsChangepointCusumSql =
    "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c " +
      "FROM events GROUP BY 1, 2), " +
      "tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS total, count(*) AS n_days " +
      "FROM daily GROUP BY 1), " +
      "cu AS (SELECT d.event_type, d.day, t.n_days, t.total, " +
      "CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS k, " +
      "CAST(sum(c) OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS pre " +
      "FROM daily d JOIN tot t USING (event_type)), " +
      "sc AS (SELECT event_type, day, n_days, total, abs(n_days * pre - k * total) AS score, " +
      "row_number() OVER (PARTITION BY event_type ORDER BY abs(n_days * pre - k * total) DESC, day) " +
      "AS rn FROM cu) " +
      "SELECT event_type, n_days, total AS n_events, day AS cp_day, score AS cp_score " +
      "FROM sc WHERE rn = 1 ORDER BY event_type"

  // ------------------------------------------------------------------
  // ts_seasonality_dow — day-of-week volume profile per event type
  // ------------------------------------------------------------------

  /** Weekly seasonality profile: each type's event share per day-of-week
    * (0 = Sunday, aligning Spark's 1-based dayofweek with DuckDB's
    * 0-based) as integer ppm, plus the uniform-baseline index
    * (share·7 — 1e6 ppm ⇒ exactly at the no-seasonality line). All
    * integer division; |types|×7 output rows.
    */
  private def tsSeasonalityDow(s: SparkSession, dir: String): DataFrame = {
    val c = Tables
      .events(s, dir)
      .groupBy(col("event_type"), (dayofweek(col("etime")) - 1).cast("long").as("dow"))
      .agg(nrows.as("n_dow"))
    val t = c.groupBy("event_type").agg(sum("n_dow").as("total"))
    c.join(broadcast(t), "event_type")
      .select(
        col("event_type"),
        col("dow"),
        col("n_dow"),
        col("total"),
        expr("n_dow * 1000000 div total").as("share_ppm"),
        expr("n_dow * 7000000 div total").as("index_ppm"),
      )
      .orderBy("event_type", "dow")
  }

  private val tsSeasonalityDowSql =
    "WITH c AS (SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow, count(*) AS n_dow " +
      "FROM events GROUP BY 1, 2), " +
      "t AS (SELECT event_type, CAST(sum(n_dow) AS BIGINT) AS total FROM c GROUP BY 1) " +
      "SELECT c.event_type, dow, n_dow, total, " +
      "n_dow * 1000000 // total AS share_ppm, n_dow * 7000000 // total AS index_ppm " +
      "FROM c JOIN t USING (event_type) ORDER BY event_type, dow"

  // ------------------------------------------------------------------
  // event_ltv_deciles — user lifetime-value decile report
  // ------------------------------------------------------------------

  /** Lifetime-value decile report: users ranked by total event value
    * (exact cents), cut into 10 ntile buckets (SQL-standard ntile: earlier
    * buckets get the remainder — identical in both engines), and each
    * decile reported with user count, exact value total, and its ppm share
    * of corpus value — "the top decile carries X% of value". The decile cut
    * runs at USER grain (events pre-aggregate first) through
    * [[ScaleRank.rankedFrame]]: range-split rank + broadcast prefix offsets
    * + closed-form ntile, so NO task ever sorts more than its range slice —
    * the r6 single-task `ntile OVER (ORDER BY)` window is gone, and the
    * corpus value total rides the same machinery as `__seg_sum` instead of
    * a second unpartitioned window over the decile rollup. Bit-identical to
    * the window form (ntile is a pure integer function of global rank).
    */
  private def eventLtvDeciles(s: SparkSession, dir: String): DataFrame = {
    val users = Tables
      .events(s, dir)
      .groupBy("user_id")
      .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("v_cents"), nrows.as("n_events"))
    ScaleRank
      .rankedFrame(users, Nil, Seq(col("v_cents").desc, col("user_id")), Some("v_cents"))
      .withColumn("decile", ScaleRank.ntileOf(10))
      .groupBy("decile")
      .agg(
        nrows.as("n_users"),
        sum("v_cents").as("v_cents"),
        sum("n_events").as("n_events"),
        max("__seg_sum").as("total"),
      )
      .select(
        col("decile"),
        col("n_users"),
        col("n_events"),
        col("v_cents"),
        expr("v_cents * 1000000 div total").as("share_ppm"),
      )
      .orderBy("decile")
  }

  private val eventLtvDecilesSql =
    "WITH u AS (SELECT user_id, CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v_cents, " +
      "CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1), " +
      "d AS (SELECT *, ntile(10) OVER (ORDER BY v_cents DESC, user_id) AS decile FROM u), " +
      "g AS (SELECT CAST(decile AS BIGINT) AS decile, CAST(count(*) AS BIGINT) AS n_users, " +
      "CAST(sum(v_cents) AS BIGINT) AS v_cents, CAST(sum(n_events) AS BIGINT) AS n_events " +
      "FROM d GROUP BY 1) " +
      "SELECT decile, n_users, n_events, v_cents, " +
      "CAST(v_cents * 1000000 // (sum(v_cents) OVER ()) AS BIGINT) AS share_ppm " +
      "FROM g ORDER BY decile"

  // ------------------------------------------------------------------
  // win_pareto_share — the 80/20 concentration cut per segment
  // ------------------------------------------------------------------

  /** Pareto concentration per market segment: rank customers by revenue
    * (exact cents, desc), find the smallest head count whose cumulative
    * revenue reaches 80% (2·cum ≥ 8·total/10 in integers — the
    * weighted-median selection law), and report it with its ppm of the
    * customer base — "N% of customers produce 80% of revenue". Revenue
    * pre-aggregates to customer grain, then rank / running sum / segment
    * total all come from ONE [[ScaleRank.rankedFrame]] pass partitioned by
    * segment: the r6 plan's five near-single-task per-segment windows
    * (|customers|/5 rows each) are replaced by range-split local windows +
    * broadcast prefix offsets, bit-identical by construction.
    */
  private def winParetoShare(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables
      .orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("rev"))
    ScaleRank
      .rankedFrame(cust, Seq("c_mktsegment"), Seq(col("rev").desc, col("c_custkey")), Some("rev"))
      .groupBy(col("c_mktsegment"))
      .agg(
        nrows.as("n_customers"),
        max("__seg_sum").as("rev_cents"),
        min(when(col("__cum") * 10 >= col("__seg_sum") * 8, col("__rn"))).as("n_top80"),
      )
      .withColumn("top80_ppm", expr("n_top80 * 1000000 div n_customers"))
      .orderBy("c_mktsegment")
  }

  private val winParetoShareSql =
    "WITH cu AS (SELECT c_mktsegment, c_custkey, " +
      "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev " +
      "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
      "r AS (SELECT c_mktsegment, c_custkey, rev, " +
      "CAST(sum(rev) OVER (PARTITION BY c_mktsegment ORDER BY rev DESC, c_custkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
      "CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY rev DESC, c_custkey) AS BIGINT) AS rn, " +
      "CAST(sum(rev) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS tot FROM cu) " +
      "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers, max(tot) AS rev_cents, " +
      "min(CASE WHEN cum * 10 >= tot * 8 THEN rn END) AS n_top80, " +
      "CAST(min(CASE WHEN cum * 10 >= tot * 8 THEN rn END) * 1000000 // count(*) AS BIGINT) AS top80_ppm " +
      "FROM r GROUP BY 1 ORDER BY c_mktsegment"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("agg_entropy_mix", aggEntropyMix, Some(aggEntropyMixSql)),
    QueryDef("agg_gini_spend", aggGiniSpend, Some(aggGiniSpendSql)),
    QueryDef("recs_item_neighbors", recsItemNeighbors, Some(recsItemNeighborsSql)),
    QueryDef("ts_changepoint_cusum", tsChangepointCusum, Some(tsChangepointCusumSql)),
    QueryDef("ts_seasonality_dow", tsSeasonalityDow, Some(tsSeasonalityDowSql)),
    QueryDef("event_ltv_deciles", eventLtvDeciles, Some(eventLtvDecilesSql)),
    QueryDef("win_pareto_share", winParetoShare, Some(winParetoShareSql)),
  )
}
