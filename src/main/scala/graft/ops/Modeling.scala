package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 experiment-analysis & feature-engineering verbs: the statistics
  * an ML-data team runs BETWEEN pipeline stages — distribution-shift tests
  * (KS), ranking quality (Mann-Whitney / AUC), link prediction over a
  * co-occurrence graph (Adamic-Adar), leakage-free cross-validation fold
  * assignment, behavioral sequence mining (event-type trigrams), and
  * weight-of-evidence categorical encoding.
  *
  * Determinism doctrine (SURVEY.md §2.0): every statistic is exact BIGINT
  * arithmetic up to at most ONE floating-point step (a final division, or a
  * single `ln` over an exact integer ratio), then round(·, 6) / integer-ppm
  * onto the declared grid. Money enters as exact cents
  * (`CAST(round(x*100) AS BIGINT)`), never as doubles.
  *
  * Scale doctrine, per op:
  *   - stats_ks_test: the empirical CDFs are compared on a FIXED $1,000 bin
  *     grid, so the cumulative window is |bins|-bounded (≤ ~600 rows for
  *     TPC-H price ranges) regardless of corpus size — the unbinned
  *     value-grain variant would need an unbounded global window. The
  *     per-group counts reach the grid via one map-side-combined
  *     aggregation of the fact scan.
  *   - stats_mannwhitney_auc: midranks are computed at distinct-VALUE grain
  *     (|price universe| rows, data-bounded ~55k cents values), not row
  *     grain; the one unpartitioned running-sum window runs over that
  *     value-grain frame. At 100 TB the seam is a two-stage prefix sum
  *     (per-range partials + broadcast offsets) — same algebra, noted at
  *     the window site.
  *   - graph_adamic_adar: pair generation is per-part (Σ c_p² over parts,
  *     never |suppliers|²) and the weight 1/ln(df) is attached to the part
  *     BEFORE the pair join, so the pair stream carries only (s1, s2,
  *     w_ppm). TPC-H caps suppliers-per-part; on a natural graph the
  *     guard is the same df-cap used everywhere else in this repo
  *     (drop hub nodes above a df ceiling before pairing).
  *   - sample_kfold_assign: the ranked-assignment window sorts each
  *     stratum by a seedless md5 priority. Strata are few but each is
  *     corpus-sized, so at 100 TB the documented degradation is fold =
  *     hash % k (no sort, ±√n balance) or a two-stage ranked split;
  *     the declared semantic keeps EXACT ±1 balance per stratum.
  *   - event_type_trigrams: lag windows are per-user (natural event-log
  *     partitioning); the trigram alphabet is |types|³-bounded, so the
  *     final aggregate is tiny.
  *   - feature_woe_encode: one fact-scan aggregation to |segments| rows;
  *     the class totals broadcast as a 1-row frame.
  */
object Modeling {

  /** Upper-side degree cap for pair-generating self-joins (the hub cap —
    * shared by graph_adamic_adar here and the jaccard/recs siblings): a key
    * shared by d rows fans out d² pairs, so one hub key concentrates
    * unbounded work in one task; keys hotter than this are dropped from
    * pair generation on BOTH engines (mirrored in each oracle SQL). Far
    * above any fixture degree, so declared outputs are unchanged;
    * ScalingLawSpec's hub fixture exercises the binding case.
    */
  private[graft] val PairDegreeCap = 10000L

  /** The two-sided support filter behind every capped pair join: keys with
    * 2 ≤ group size ≤ cap. Hapax keys generate no pairs; keys above the cap
    * would each fan out > cap² pairs into one task. Exposed so
    * ScalingLawSpec can drive it with a synthetic hub fixture.
    */
  private[graft] def pairableKeys(df: DataFrame, key: String, cap: Long): DataFrame =
    df.groupBy(key)
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= cap)
      .select(key)

  /** Work-proportional partition count for the per-part supplier-pair
    * AGGREGATES (graph_adamic_adar / graph_jaccard_neighbors) — the r14
    * fix for the first super-linear growth measured in a second decade
    * (93 GB of spill at the dev session's fixed 32 shuffle partitions;
    * zero after sizing — mechanics, memoization, and the baseline rule
    * live in [[PairBudget]]). The estimate is one column-pruned aggregate
    * over raw lineitem: Σ c·(c−1)/2 over per-part row counts, an upper
    * bound on the post-distinct, post-cap pair count (oversizing slightly
    * is free — the partitions just come out smaller). Below the byte gate
    * callers keep their EXACT small-scale plan; results are
    * partitioning-invariant either way (§2.0).
    */
  private[graft] def pairAggPartitions(s: SparkSession, dir: String): Option[Int] =
    PairBudget.sizedPartitions(s, dir, "lineitem", s"pairagg:part:$dir")(
      Tables.lineitem(s, dir).select(col("l_partkey")),
      "l_partkey",
    )

  /** Same sizing for the BASKET-pair aggregates (market_basket_lift /
    * recs_item_neighbors), whose pair stream is keyed by order basket:
    * Σ c·(c−1)/2 over per-ORDER lineitem counts upper-bounds the
    * post-distinct basket-pair count. r14 measured market_basket_lift at
    * 10.6× growth on a 10× decade — the same fixed-partition aggregate
    * wall as the graph keys, one decade later; this sizes it before it
    * hits.
    */
  private[graft] def basketPairAggPartitions(s: SparkSession, dir: String): Option[Int] =
    PairBudget.sizedPartitions(s, dir, "lineitem", s"pairagg:basket:$dir")(
      Tables.lineitem(s, dir).select(col("l_orderkey")),
      "l_orderkey",
    )

  /** Scale-sized DISTINCT for the linear key streams that FEED the pair
    * joins (r15 — the one spilling stage the r15 basket-pair sizing left
    * behind: the raw (orderkey, partkey) distinct, 1.1 GB memory-spill at
    * sf10's 32 tasks). Above the byte gate, hash-repartition the raw rows
    * on ALL the distinct keys to a work-proportional count before the
    * aggregate: the explicit-n exchange satisfies the aggregate's
    * clustering requirement (no second exchange) and is exempt from AQE
    * coalescing, so the distinct's hash state is split
    * rows/[[PairBudget.RowsPerLinearTask]] ways. The row estimate is a
    * memoized column-pruned lineitem count — exact for the (orderkey, partkey)
    * streams and a 1:1 upper bound for the order-join customer–supplier
    * stream. Below the gate: plain distinct(), byte-identical plan.
    */
  private[graft] def sizedDistinct(s: SparkSession, dir: String, df: DataFrame): DataFrame =
    distinctWith(
      PairBudget.linearAggPartitions(s, dir, "lineitem", s"rows:lineitem:$dir")(
        Tables.lineitem(s, dir).count().toDouble),
      df,
    )

  /** The plumbing half of [[sizedDistinct]], split out so the sized branch
    * is unit-testable at spec scale (where the real row counts never clear
    * the session baseline): hash-repartition on ALL columns so the distinct
    * aggregate runs at exactly n tasks (the exchange satisfies its
    * clustering requirement), then CHECKPOINT the result. The checkpoint is
    * load-bearing, not an optimization nicety: every caller references the
    * distinct frame 3–5 times (self-join sides, support aggregates, node
    * frames), and a REPARTITION_BY_NUM exchange defeats AQE's runtime stage
    * reuse — measured at sf10, the un-checkpointed sized plan materialized
    * the 571 MB scan→exchange subtree three times and ran 1.8× SLOWER than
    * the unsized plan whose ENSURE_REQUIREMENTS exchange was stage-reused
    * (95 s vs 55 s, market_basket_lift). Checkpointing computes the sized,
    * spill-free distinct ONCE and every consumer reads the materialized
    * blocks — which also beats the unsized plan's shape, where the final
    * distinct aggregate re-ran per consumer. Below the gate (None) the
    * plain distinct keeps dev plans byte-identical.
    */
  private[graft] def distinctWith(n: Option[Int], df: DataFrame): DataFrame =
    n.map { p =>
      // eager=false (r15 ADVICE): localCheckpoint persists on first compute,
      // so consumers still share the materialized blocks within the
      // executing action — but building the query (plan inspection, a
      // refused/abandoned query) no longer runs the full scan+shuffle+
      // distinct job at construction time.
      Checkpoints.stable(
        df.repartition(p, df.columns.map(col).toIndexedSeq: _*).distinct(),
        eager = false)
    }.getOrElse(df.distinct())

  // ------------------------------------------------------------------
  // stats_ks_test — binned two-sample Kolmogorov-Smirnov distance
  // ------------------------------------------------------------------

  /** Distribution-shift test between two customer segments' order totals:
    * the two-sample KS statistic on a fixed $1,000 bin grid (binned KS —
    * the streaming/large-scale form; the unbinned statistic is the grid
    * limit). Cumulative counts c1, c2 ride ONE |bins|-bounded running
    * window; D = max|c1·N2 − c2·N1| is reported in ppm of N1·N2 along with
    * the 5 most divergent bins. All arithmetic is exact int64 through
    * ~sf1 (c·N products; past that the seam is one DECIMAL(38) cast on
    * the cross products).
    */
  private def statsKsTest(s: SparkSession, dir: String): DataFrame = {
    val j = Tables
      .orders(s, dir)
      .join(
        Tables.customer(s, dir).filter(col("c_mktsegment").isin("BUILDING", "MACHINERY")),
        col("o_custkey") === col("c_custkey"),
      )
      .select(
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT) div 100000").as("bin"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("g1"),
      )
    val bins = j
      .groupBy("bin")
      .agg(sum(col("g1")).as("n1"), sum(lit(1L) - col("g1")).as("n2"))
    // |bins|-bounded unpartitioned running window (≤ ~600 rows — the fixed
    // $1,000 grid over the TPC-H price domain), per the boundedness rule for
    // orderBy-without-partitionBy sites
    val run = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = bins.agg(sum("n1").as("t1"), sum("n2").as("t2"))
    bins
      .withColumn("c1", sum("n1").over(run))
      .withColumn("c2", sum("n2").over(run))
      .join(broadcast(tot)) // 1-row group totals
      .withColumn("diff", abs(col("c1") * col("t2") - col("c2") * col("t1")))
      .orderBy(col("diff").desc, col("bin"))
      .limit(5)
      .select(
        col("bin"),
        col("n1"),
        col("n2"),
        col("c1"),
        col("c2"),
        expr("diff * 1000000 div (t1 * t2)").as("d_ppm"),
      )
  }

  private val statsKsTestSql =
    "WITH j AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100000 AS bin, " +
      "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1 " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "WHERE c_mktsegment IN ('BUILDING','MACHINERY')), " +
      "b AS (SELECT bin, CAST(sum(g1) AS BIGINT) AS n1, CAST(sum(1 - g1) AS BIGINT) AS n2 FROM j GROUP BY 1), " +
      "c AS (SELECT bin, n1, n2, " +
      "CAST(sum(n1) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1, " +
      "CAST(sum(n2) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2, " +
      "CAST(sum(n1) OVER () AS BIGINT) AS t1, CAST(sum(n2) OVER () AS BIGINT) AS t2 FROM b), " +
      "d AS (SELECT *, abs(c1 * t2 - c2 * t1) AS diff FROM c) " +
      "SELECT bin, n1, n2, c1, c2, CAST(diff * 1000000 // (t1 * t2) AS BIGINT) AS d_ppm " +
      "FROM d ORDER BY diff DESC, bin LIMIT 5"

  // ------------------------------------------------------------------
  // stats_mannwhitney_auc — rank-sum U and the equivalent AUC
  // ------------------------------------------------------------------

  /** Mann-Whitney U between the same two segments' order totals, with exact
    * midrank tie handling, reported with its AUC reading (U/(N1·N2) — "the
    * probability a random BUILDING total outranks a random MACHINERY one",
    * the rank-biserial/AUC equivalence an ML team actually consumes).
    * Doubled midranks 2·rank keep everything integer: per distinct cent
    * value v, 2·midrank = 2·(#rows below v) + (#rows at v) + 1, so
    * 2U1 = Σ n1_v·midrank2x − N1·(N1+1) is exact int64. The prefix sum is
    * VALUE-grain (distinct cents), not row-grain, and runs distributed
    * through [[ScaleRank.rankedFrame]] (range-split local cumsum +
    * broadcast prefix offsets), so even a cent domain in the 1e8s never
    * funnels through a single-task window.
    */
  private def statsMannwhitneyAuc(s: SparkSession, dir: String): DataFrame = {
    val j = Tables
      .orders(s, dir)
      .join(
        Tables.customer(s, dir).filter(col("c_mktsegment").isin("BUILDING", "MACHINERY")),
        col("o_custkey") === col("c_custkey"),
      )
      .select(
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("g1"),
      )
    val vals = j.groupBy("v").agg(nrows.as("n"), sum("g1").as("n1"))
    ScaleRank
      .rankedFrame(vals, Nil, Seq(col("v")), Some("n"))
      .withColumn("r2x", lit(2L) * (col("__cum") - col("n")) + col("n") + lit(1L))
      .agg(
        sum("n1").as("s1"),
        sum("n").as("sn"),
        sum(col("n1") * col("r2x")).as("r1_2x"),
      )
      .select(
        col("s1").as("n1"),
        (col("sn") - col("s1")).as("n2"),
        (col("r1_2x") - col("s1") * (col("s1") + lit(1L))).as("u2x"),
        expr("(r1_2x - s1 * (s1 + 1)) * 1000000 div (2 * s1 * (sn - s1))").as("auc_ppm"),
      )
  }

  private val statsMannwhitneyAucSql =
    "WITH j AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v, " +
      "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1 " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "WHERE c_mktsegment IN ('BUILDING','MACHINERY')), " +
      "vals AS (SELECT v, CAST(count(*) AS BIGINT) AS n, CAST(sum(g1) AS BIGINT) AS n1 FROM j GROUP BY 1), " +
      "r AS (SELECT *, CAST(sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM vals), " +
      "m AS (SELECT CAST(sum(n1) AS BIGINT) AS s1, CAST(sum(n) AS BIGINT) AS sn, " +
      "CAST(sum(n1 * (2 * (cum - n) + n + 1)) AS BIGINT) AS r1_2x FROM r) " +
      "SELECT s1 AS n1, sn - s1 AS n2, r1_2x - s1 * (s1 + 1) AS u2x, " +
      "CAST((r1_2x - s1 * (s1 + 1)) * 1000000 // (2 * s1 * (sn - s1)) AS BIGINT) AS auc_ppm FROM m"

  // ------------------------------------------------------------------
  // graph_adamic_adar — link prediction over the supplier co-part graph
  // ------------------------------------------------------------------

  /** Adamic-Adar link-prediction scores between suppliers that stock the
    * same parts: AA(s1,s2) = Σ_{shared part p} 1/ln(df_p), the classic
    * common-neighbor score that discounts ubiquitous neighbors. The weight
    * is integer-ized per PART (w_ppm = round(10⁶/ln(df)) — one double
    * division + ln over a small exact integer) BEFORE the pair join, so the
    * pair aggregation sums exact BIGINTs in any order. Pairs are generated
    * per-part (Σ df² work, never |suppliers|²); df=1 parts can produce no
    * pair and are pruned like the shingle self-joins (Text.pairableShingles).
    */
  private def graphAdamicAdar(s: SparkSession, dir: String): DataFrame = {
    // Codegen'd equi-self-join on the part key (the market_basket_lift
    // shape). A collect_set + HOF pair-explosion variant was A/B-measured
    // at 3.7× SLOWER (10.7 s vs 2.9 s at sf0.1): higher-order functions
    // run interpreted per element (the r4 decontaminate lesson), while
    // this join stays inside whole-stage codegen end to end. Both self-join
    // sides and the df frame are the SAME distinct subtree: below the byte
    // gate its exchange is planned once and AQE stage reuse feeds all three
    // references; above it (r15) the sized distinct is checkpointed and all
    // three read the materialized blocks (see sizedDistinct).
    val sp = sizedDistinct(
      s, dir, Tables.lineitem(s, dir).select(col("l_partkey").as("p"), col("l_suppkey").as("sk")))
    // two-sided support: df >= 2 (hapax parts generate no pairs) AND
    // df <= cap — the hub cap. A part shared by d suppliers fans out d²
    // pairs; one planet-hot hub would put its whole d² in one task, while
    // its AA weight 1/ln(d) → 0 makes it noise anyway. The cap bounds
    // per-key pair work at cap² and is mirrored in the oracle SQL (never
    // binds on TPC-H fixtures — outputs unchanged; ScalingLawSpec's hub
    // fixture shows it binding).
    val pc = sp
      .groupBy("p")
      .agg(nrows.as("df"))
      .filter(col("df") >= 2 && col("df") <= PairDegreeCap)
      .withColumn("w_ppm", round(lit(1000000.0) / log(col("df").cast("double")), 0).cast("long"))
    val b = sp
      .withColumnRenamed("sk", "s2")
      .join(pc, "p")
    val pairs = sp
      .join(b, Seq("p"))
      .filter(col("sk") < col("s2"))
    // scale path (r14): above the byte gate, spread the pair aggregate
    // over work-proportional partitions — see pairAggPartitions
    pairAggPartitions(s, dir)
      .map(n => pairs.repartition(n, col("sk"), col("s2")))
      .getOrElse(pairs)
      .groupBy(col("sk").as("s1"), col("s2"))
      .agg(nrows.as("n_common"), sum("w_ppm").as("aa_ppm"))
      .orderBy(col("aa_ppm").desc, col("s1"), col("s2"))
      .limit(50)
  }

  private val graphAdamicAdarSql =
    "WITH sp AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem), " +
      "pc AS (SELECT p, CAST(count(*) AS BIGINT) AS df FROM sp GROUP BY 1 " +
      s"HAVING count(*) >= 2 AND count(*) <= ${graft.ops.Modeling.PairDegreeCap}), " +
      "pw AS (SELECT p, CAST(round(1000000.0 / ln(CAST(df AS DOUBLE)), 0) AS BIGINT) AS w_ppm FROM pc) " +
      "SELECT a.sk AS s1, b.sk AS s2, CAST(count(*) AS BIGINT) AS n_common, CAST(sum(w_ppm) AS BIGINT) AS aa_ppm " +
      "FROM sp a JOIN sp b ON a.p = b.p AND a.sk < b.sk JOIN pw ON pw.p = a.p " +
      "GROUP BY 1, 2 ORDER BY aa_ppm DESC, s1, s2 LIMIT 50"

  // ------------------------------------------------------------------
  // sample_kfold_assign — stratified k-fold with exact ±1 balance
  // ------------------------------------------------------------------

  /** Deterministic stratified 5-fold assignment over documents: within each
    * lang stratum, docs are ranked by the seedless md5 priority
    * (hash52 — the same uniform every sampler in this repo uses) and dealt
    * round-robin, so fold sizes within a stratum differ by at most 1 and
    * the assignment is reproducible from doc_id alone (no state, no RNG).
    * Declared at (lang, fold) grain with an id-sum checksum so the gate
    * pins the exact membership, not just the sizes.
    */
  private def sampleKfoldAssign(s: SparkSession, dir: String): DataFrame = {
    // per-stratum rank via ScaleRank — the round-robin deal needs a full
    // rank (no top-k prune applies), and the r6 per-lang window task held
    // the stratum's whole corpus slice
    val base = Tables
      .documents(s, dir)
      .select(col("lang"), col("doc_id"), hash52("kf#", col("doc_id")).as("prio"))
    ScaleRank
      .rankedFrame(base, Seq("lang"), Seq(col("prio"), col("doc_id")), None)
      .withColumn("fold", (col("__rn") - lit(1L)) % lit(5L))
      .groupBy("lang", "fold")
      .agg(nrows.as("n_docs"), sum("doc_id").as("id_sum"), min("doc_id").as("min_doc"))
      .orderBy("lang", "fold")
  }

  private val sampleKfoldAssignSql =
    s"WITH p AS (SELECT lang, doc_id, ${graft.Qf.hash52Sql("kf#", "doc_id")} AS prio FROM documents), " +
      "r AS (SELECT lang, doc_id, " +
      "(CAST(row_number() OVER (PARTITION BY lang ORDER BY prio, doc_id) AS BIGINT) - 1) % 5 AS fold FROM p) " +
      "SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum, " +
      "CAST(min(doc_id) AS BIGINT) AS min_doc FROM r GROUP BY 1, 2 ORDER BY lang, fold"

  // ------------------------------------------------------------------
  // event_type_trigrams — behavioral sequence mining
  // ------------------------------------------------------------------

  /** Most frequent length-3 event-type sequences per user journey (the
    * sequence-mining primitive behind funnel discovery and next-action
    * models): two lags over the per-user time order form each consecutive
    * trigram; counts and distinct-user support aggregate over a
    * |types|³-bounded alphabet. Ordering ties inside a user at the same
    * timestamp break on event_id — the same total order every sessionize/
    * funnel verb in this repo uses.
    */
  private def eventTypeTrigrams(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables
      .events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t1", lag("event_type", 2).over(w))
      .withColumn("t2", lag("event_type", 1).over(w))
      .filter(col("t1").isNotNull)
      .select(col("user_id"), concat_ws(">", col("t1"), col("t2"), col("event_type")).as("trigram"))
      .groupBy("trigram")
      .agg(nrows.as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("trigram"))
      .limit(25)
  }

  private val eventTypeTrigramsSql =
    "WITH o AS (SELECT user_id, event_type, " +
      "lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1, " +
      "lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2 " +
      "FROM events) " +
      "SELECT t1 || '>' || t2 || '>' || event_type AS trigram, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users " +
      "FROM o WHERE t1 IS NOT NULL GROUP BY 1 ORDER BY n DESC, trigram LIMIT 25"

  // ------------------------------------------------------------------
  // feature_woe_encode — weight-of-evidence categorical encoding
  // ------------------------------------------------------------------

  /** Weight-of-evidence encoding of customer segment against the urgent-
    * order label: WOE_i = ln((pos_i·NEG)/(neg_i·POS)) — the log-odds-ratio
    * encoding credit-risk and CTR models use for high-cardinality
    * categoricals (vs feature_target_encode's plain smoothed mean). The
    * argument of ln is ONE double division of exact int64 cross products,
    * so both engines feed ln the identical double; round(·, 6) lands the
    * declared grid. Class totals ride a broadcast 1-row frame — the fact
    * table aggregates once, to |segments| rows.
    */
  private def featureWoeEncode(s: SparkSession, dir: String): DataFrame = {
    val j = Tables
      .orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
    val seg = j.groupBy("segment").agg(nrows.as("n_orders"), sum("y").as("pos"))
    val tot = seg.agg(sum("pos").as("tpos"), sum(col("n_orders") - col("pos")).as("tneg"))
    seg
      .join(broadcast(tot)) // 1-row class totals
      .select(
        col("segment"),
        col("n_orders"),
        col("pos"),
        round(
          log(
            (col("pos") * col("tneg")).cast("double") /
              ((col("n_orders") - col("pos")) * col("tpos")).cast("double")
          ),
          6,
        ).as("woe"),
      )
      .orderBy("segment")
  }

  private val featureWoeEncodeSql =
    "WITH j AS (SELECT c_mktsegment AS segment, CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y " +
      "FROM orders JOIN customer ON o_custkey = c_custkey), " +
      "seg AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_orders, CAST(sum(y) AS BIGINT) AS pos FROM j GROUP BY 1), " +
      "t AS (SELECT CAST(sum(pos) AS BIGINT) AS tpos, CAST(sum(n_orders - pos) AS BIGINT) AS tneg FROM seg) " +
      "SELECT segment, n_orders, pos, " +
      "round(ln(CAST(pos * tneg AS DOUBLE) / CAST((n_orders - pos) * tpos AS DOUBLE)), 6) AS woe " +
      "FROM seg, t ORDER BY segment"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("stats_ks_test", statsKsTest, Some(statsKsTestSql)),
    QueryDef("stats_mannwhitney_auc", statsMannwhitneyAuc, Some(statsMannwhitneyAucSql)),
    QueryDef("graph_adamic_adar", graphAdamicAdar, Some(graphAdamicAdarSql)),
    QueryDef("sample_kfold_assign", sampleKfoldAssign, Some(sampleKfoldAssignSql)),
    QueryDef("event_type_trigrams", eventTypeTrigrams, Some(eventTypeTrigramsSql)),
    QueryDef("feature_woe_encode", featureWoeEncode, Some(featureWoeEncodeSql)),
  )
}
