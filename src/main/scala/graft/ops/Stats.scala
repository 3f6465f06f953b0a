package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 statistical-modeling & data-forensics verbs: per-series linear
  * trend fitting, χ² term–label association (the feature-selection step of
  * a quality-classifier pipeline), rolling-median smoothing, cross-series
  * correlation, BPE merge-candidate counting (the first step of tokenizer
  * training), and Benford first-digit forensics.
  *
  * Determinism doctrine (SURVEY.md §2.0): every statistic here is a ratio
  * of EXACT BIGINT moments — the only floating-point steps are the final
  * division (one correctly-rounded IEEE op over operands both engines
  * derive identically) plus, where unavoidable, a sqrt with the same
  * property, then round(·, 6) onto the declared grid. No double ever
  * enters a reassociable sum.
  *
  * Scale doctrine, per op:
  *   - stats_linreg_trend / ts_cross_corr: daily counts are span-bounded
  *     (|days| rows per series) — the regression/correlation moments ride
  *     one map-side-combined aggregation of that tiny frame. At 100 TB the
  *     moment sums stay int64-exact far past sf1 (documented per site);
  *     the overflow seam is one cast to DECIMAL(38).
  *   - stats_chi2_terms: contingency cells come from one corpus scan with
  *     per-doc array_distinct (map-side dedup, no distinct() shuffle);
  *     the per-term frame is vocabulary-bounded; N and K broadcast as a
  *     1-row frame.
  *   - win_rolling_median: the collect_list window is 7-ROW bounded by
  *     construction (rowsBetween(-6, 0)) over span-bounded daily frames —
  *     never a corpus-sized buffer.
  *   - tokenizer_bpe_pairs: pair counting is VOCABULARY-grain, not corpus
  *     grain — the corpus collapses to (word, freq) first (the shuffle is
  *     |vocab| rows), and the pair explosion is Σ|word| over the vocab.
  *     This is why BPE training scales: the corpus is touched once per
  *     vocab build, not once per merge.
  *   - dq_benford: first digits come from exact integer cents (no double
  *     formatting), one |digits|=9-row aggregate, total broadcast.
  */
object Stats {

  private def dailyCounts(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy(col("event_type"), to_date(col("etime")).as("day"))
      .agg(nrows.as("c"))

  // ------------------------------------------------------------------
  // stats_linreg_trend — OLS volume trend per event type
  // ------------------------------------------------------------------

  /** Per-type least-squares trend of daily event volume over the day index
    * k = 1..n: slope, intercept, and r² in closed form from exact BIGINT
    * moments (n, Σk, Σc, Σkc, Σk², Σc²). Each statistic is ONE double
    * division of exact int64 operands (slope/intercept) or a division of
    * two exact int64 products (r² — both sides < 2⁶³ through sf1; past
    * that the seam is a DECIMAL(38) cast on the moment sums). Day index
    * instead of raw dates keeps the x-moments tiny and engine-agnostic.
    */
  private def statsLinregTrend(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    dailyCounts(s, dir)
      .withColumn("k", asLong(row_number().over(w)))
      .groupBy("event_type")
      .agg(
        nrows.as("n"),
        sum("k").as("sk"),
        sum("c").as("sc"),
        sum(col("k") * col("c")).as("skc"),
        sum(col("k") * col("k")).as("sk2"),
        sum(col("c") * col("c")).as("sc2"),
      )
      .select(
        col("event_type"),
        col("n").as("n_days"),
        col("sc").as("n_events"),
        zround(
          round(
            (col("n") * col("skc") - col("sk") * col("sc")).cast("double") /
              (col("n") * col("sk2") - col("sk") * col("sk")).cast("double"),
            6,
          )
        ).as("slope"),
        round(
          (col("sc") * col("sk2") - col("sk") * col("skc")).cast("double") /
            (col("n") * col("sk2") - col("sk") * col("sk")).cast("double"),
          6,
        ).as("intercept"),
        round(
          ((col("n") * col("skc") - col("sk") * col("sc")) *
            (col("n") * col("skc") - col("sk") * col("sc"))).cast("double") /
            ((col("n") * col("sk2") - col("sk") * col("sk")) *
              (col("n") * col("sc2") - col("sc") * col("sc"))).cast("double"),
          6,
        ).as("r2"),
      )
      .orderBy("event_type")
  }

  private val statsLinregTrendSql =
    "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY 1,2), " +
      "r AS (SELECT event_type, CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS k, " +
      "CAST(c AS BIGINT) AS c FROM daily), " +
      "m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sk, " +
      "CAST(sum(c) AS BIGINT) AS sc, CAST(sum(k*c) AS BIGINT) AS skc, " +
      "CAST(sum(k*k) AS BIGINT) AS sk2, CAST(sum(c*c) AS BIGINT) AS sc2 FROM r GROUP BY 1) " +
      "SELECT event_type, n AS n_days, sc AS n_events, " +
      "CASE WHEN round(CAST(n*skc - sk*sc AS DOUBLE) / CAST(n*sk2 - sk*sk AS DOUBLE), 6) = 0 THEN 0.0 " +
      "ELSE round(CAST(n*skc - sk*sc AS DOUBLE) / CAST(n*sk2 - sk*sk AS DOUBLE), 6) END AS slope, " +
      "round(CAST(sc*sk2 - sk*skc AS DOUBLE) / CAST(n*sk2 - sk*sk AS DOUBLE), 6) AS intercept, " +
      "round(CAST((n*skc - sk*sc)*(n*skc - sk*sc) AS DOUBLE) / " +
      "CAST((n*sk2 - sk*sk)*(n*sc2 - sc*sc) AS DOUBLE), 6) AS r2 " +
      "FROM m ORDER BY event_type"

  // ------------------------------------------------------------------
  // stats_chi2_terms — χ² term–label association over documents
  // ------------------------------------------------------------------

  /** Feature selection for a document-quality/language classifier: the χ²
    * statistic of each vocabulary term's presence against the binary label
    * lang = 'en', from the 2×2 contingency table (a = en docs containing
    * the term, n_t = docs containing it, K = en docs, N = docs). With
    * b = n_t−a, c = K−a, d = N−K−b, the statistic N·(ad−bc)²/((a+b)(c+d)
    * (a+c)(b+d)) reduces to exact int64 numerator and denominator — ONE
    * double division total. Per-doc term presence is array_distinct before
    * the explode (map-side dedup — the corpus never shuffles at token
    * grain, only (term, doc) pairs do). Terms present in every doc carry
    * an undefined χ² (0/0) and are excluded on both sides.
    */
  private def statsChi2Terms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tx = docs
      .select(
        (col("lang") === "en").cast("long").as("y"),
        explode(array_distinct(split(Text.normText(col("text")), " "))).as("term"),
      )
    val tl = tx.groupBy("term").agg(nrows.as("n_t"), sum("y").as("a"))
    val g = docs.agg(nrows.as("n"), sum((col("lang") === "en").cast("long")).as("k"))
    tl.join(broadcast(g)) // 1-row global frame
      .filter(col("n_t") < col("n"))
      .withColumn(
        "d2",
        col("a") * (col("n") - col("k") - col("n_t") + col("a")) -
          (col("n_t") - col("a")) * (col("k") - col("a")),
      )
      .select(
        col("term"),
        col("n_t").as("n_docs"),
        col("a").as("n_pos"),
        round(
          (col("n") * col("d2") * col("d2")).cast("double") /
            (col("n_t") * (col("n") - col("n_t")) * col("k") * (col("n") - col("k")))
              .cast("double"),
          6,
        ).as("chi2"),
      )
      .orderBy("term")
  }

  private val statsChi2TermsSql =
    "WITH tx AS (SELECT doc_id, CASE WHEN lang='en' THEN 1 ELSE 0 END AS y, " +
      "unnest(list_distinct(string_split(lower(trim(regexp_replace(text,'[ \\t\\n\\r\\f\\x0B]+',' ','g'))),' '))) AS term " +
      "FROM documents), " +
      "tl AS (SELECT term, CAST(count(*) AS BIGINT) AS n_t, CAST(sum(y) AS BIGINT) AS a FROM tx GROUP BY 1), " +
      "g AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS k FROM documents) " +
      "SELECT term, n_t AS n_docs, a AS n_pos, " +
      "round(CAST(n * (a*(n-k-n_t+a) - (n_t-a)*(k-a)) * (a*(n-k-n_t+a) - (n_t-a)*(k-a)) AS DOUBLE) " +
      "/ CAST(n_t * (n - n_t) * k * (n - k) AS DOUBLE), 6) AS chi2 " +
      "FROM tl, g WHERE n_t < n ORDER BY term"

  // ------------------------------------------------------------------
  // win_rolling_median — 7-day rolling median/min/max of daily volume
  // ------------------------------------------------------------------

  /** Rolling 7-day median (plus min/max) of daily event volume per type —
    * the robust-smoothing primitive rank-based anomaly detection builds
    * on. Neither engine has an exact median window function with identical
    * semantics, so BOTH sides spell it the same way: collect the 7-row
    * frame into a list, sort it, index the middle. The frame is ROW-bounded
    * (rowsBetween(-6, 0)) so the buffer is 7 longs regardless of scale;
    * the even-count median (x+y)/2 is exact in binary FP (division by 2
    * never rounds), so the declared double is bit-identical cross-engine.
    */
  private def winRollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    dailyCounts(s, dir)
      .withColumn("win", sort_array(collect_list(col("c")).over(w)))
      .withColumn("n_win", asLong(size(col("win"))))
      .select(
        col("event_type"),
        col("day"),
        col("c"),
        col("n_win"),
        when(
          col("n_win") % 2 === 1,
          element_at(col("win"), ((col("n_win") + 1) / 2).cast("int")).cast("double"),
        ).otherwise(
          (element_at(col("win"), (col("n_win") / 2).cast("int")) +
            element_at(col("win"), (col("n_win") / 2 + 1).cast("int"))).cast("double") / 2
        ).as("med"),
        element_at(col("win"), 1).as("mn"),
        element_at(col("win"), col("n_win").cast("int")).as("mx"),
      )
      .orderBy("event_type", "day")
  }

  private val winRollingMedianSql =
    "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY 1,2), " +
      "w AS (SELECT event_type, day, CAST(c AS BIGINT) AS c, " +
      "list_sort(list(CAST(c AS BIGINT)) OVER (PARTITION BY event_type ORDER BY day " +
      "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win FROM daily) " +
      "SELECT event_type, day, c, CAST(len(win) AS BIGINT) AS n_win, " +
      "CASE WHEN len(win) % 2 = 1 THEN CAST(win[(len(win)+1)//2] AS DOUBLE) " +
      "ELSE CAST(win[len(win)//2] + win[len(win)//2+1] AS DOUBLE)/2 END AS med, " +
      "win[1] AS mn, win[len(win)] AS mx " +
      "FROM w ORDER BY event_type, day"

  // ------------------------------------------------------------------
  // ts_cross_corr — lagged Pearson correlation between event-type series
  // ------------------------------------------------------------------

  /** Pairwise Pearson correlation between event types' daily volume
    * series, at lag 0 (same-day) and lag 1 (does series A lead series B by
    * one day?). The join is day-aligned on the span-bounded daily frame —
    * |types|²·|days| pair rows, never event-grain. r's numerator is an
    * exact int64; the denominator is √ of a product of two exact int64
    * sums-of-squares — sqrt and the division are each one correctly-
    * rounded IEEE op, so round(·, 6) lands identically cross-engine.
    */
  private def tsCrossCorr(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyCounts(s, dir)
    val lags = Seq(0, 1)
      .foldLeft(Option.empty[DataFrame]) { (acc, l) =>
        val d = daily.select(lit(l.toLong).as("lag"), col("event_type"), col("day"), col("c"))
        Some(acc.fold(d)(_.unionByName(d)))
      }
      .get
    val a = daily.select(col("event_type").as("type_a"), col("day"), col("c").as("x"))
    // shift the lag onto the build side pre-join, so the join is a plain
    // equi-join on `day` (hashable) with the type ordering as residual —
    // an expression like day_b = day + lag referencing both sides would
    // degrade to a nested-loop join
    val b = lags.select(
      col("lag"),
      col("event_type").as("type_b"),
      date_sub(col("day"), col("lag").cast("int")).as("day"),
      col("c").as("y"),
    )
    a.join(b, a("day") === b("day") && col("type_b") > col("type_a"))
      .groupBy("type_a", "type_b", "lag")
      .agg(
        nrows.as("n"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"),
      )
      .select(
        col("type_a"),
        col("type_b"),
        col("lag"),
        col("n").as("n_days"),
        zround(
          round(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt(
                ((col("n") * col("sx2") - col("sx") * col("sx")) *
                  (col("n") * col("sy2") - col("sy") * col("sy"))).cast("double")
              ),
            6,
          )
        ).as("r"),
      )
      .orderBy("type_a", "type_b", "lag")
  }

  private val tsCrossCorrSql =
    "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c " +
      "FROM events GROUP BY 1,2), " +
      "p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag AS lag, a.c AS x, b.c AS y " +
      "FROM daily a, (VALUES (CAST(0 AS BIGINT)),(CAST(1 AS BIGINT))) l(lag) " +
      "JOIN daily b ON b.event_type > a.event_type AND b.day = a.day + CAST(l.lag AS INT)), " +
      "m AS (SELECT type_a, type_b, lag, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy, " +
      "CAST(sum(x*x) AS BIGINT) AS sx2, CAST(sum(y*y) AS BIGINT) AS sy2 FROM p GROUP BY 1,2,3) " +
      "SELECT type_a, type_b, lag, n AS n_days, " +
      "CASE WHEN round(CAST(n*sxy - sx*sy AS DOUBLE) / sqrt(CAST((n*sx2 - sx*sx)*(n*sy2 - sy*sy) AS DOUBLE)), 6) = 0 THEN 0.0 " +
      "ELSE round(CAST(n*sxy - sx*sy AS DOUBLE) / sqrt(CAST((n*sx2 - sx*sx)*(n*sy2 - sy*sy) AS DOUBLE)), 6) END AS r " +
      "FROM m ORDER BY type_a, type_b, lag"

  // ------------------------------------------------------------------
  // tokenizer_bpe_pairs — BPE first-merge candidate counts
  // ------------------------------------------------------------------

  /** The first iteration of byte-pair-encoding tokenizer training: count
    * adjacent character pairs across the corpus, weighted by word
    * frequency, and surface the top merge candidates. The corpus collapses
    * to the (word, freq) vocabulary FIRST — pair explosion then runs at
    * vocabulary grain (Σ|word| rows over |vocab|), which is what makes
    * iterated BPE training tractable at 100 TB: each merge round touches
    * the vocab frame, not the corpus. Pairs repeat within a word ("aaa"
    * counts "aa" twice), matching the BPE definition. All counts are exact
    * BIGINTs; the top-20 cut orders by (count desc, pair) — an exact-int +
    * ASCII-string key both engines sort identically.
    */
  private def tokenizerBpePairs(s: SparkSession, dir: String): DataFrame = {
    val wf = Tables
      .documents(s, dir)
      .select(explode(split(Text.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w")
      .agg(nrows.as("wf"))
    wf.select(
      col("w"),
      col("wf"),
      explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
    ).groupBy("pair")
      .agg(countDistinct(col("w")).as("n_words"), sum("wf").as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(20)
  }

  private val tokenizerBpePairsSql =
    "WITH wx AS (SELECT unnest(string_split(lower(trim(regexp_replace(text,'[ \\t\\n\\r\\f\\x0B]+',' ','g'))),' ')) AS w " +
      "FROM documents), " +
      "wf AS (SELECT w, count(*) AS wf FROM wx WHERE len(w) >= 2 GROUP BY 1), " +
      "pr AS (SELECT w, wf, unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair FROM wf) " +
      "SELECT pair, CAST(count(DISTINCT w) AS BIGINT) AS n_words, CAST(sum(wf) AS BIGINT) AS n_occ " +
      "FROM pr GROUP BY 1 ORDER BY n_occ DESC, pair LIMIT 20"

  // ------------------------------------------------------------------
  // dq_benford — first-digit distribution vs Benford's law
  // ------------------------------------------------------------------

  /** First-significant-digit forensics on order totals: the observed digit
    * distribution against Benford's law, the standard fabricated-data /
    * unit-mixing screen in data quality audits. Digits come from EXACT
    * integer cents (round(price·100) → BIGINT → first character), never
    * from double formatting. Expected shares are hard-coded integer ppm
    * constants (round(log10(1+1/d)·10⁶)) identical on both sides, so the
    * whole result is integer arithmetic — no FP at all.
    */
  private val BenfordPpm = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  private def dqBenford(s: SparkSession, dir: String): DataFrame = {
    val n = Tables
      .orders(s, dir)
      .filter(col("o_totalprice") > 0)
      .select(
        substring(round(col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1)
          .cast("long")
          .as("digit")
      )
      .groupBy("digit")
      .agg(nrows.as("n"))
    val t = n.agg(sum("n").as("total"))
    n.join(broadcast(t)) // 1-row total
      .withColumn("share_ppm", expr("n * 1000000 div total"))
      .withColumn(
        "benford_ppm",
        element_at(array(BenfordPpm.map(lit): _*), col("digit").cast("int")),
      )
      .select(
        col("digit"),
        col("n"),
        col("share_ppm"),
        col("benford_ppm"),
        (col("share_ppm") - col("benford_ppm")).as("dev_ppm"),
      )
      .orderBy("digit")
  }

  private val dqBenfordSql = {
    val lst = BenfordPpm.mkString("[", ",", "]")
    "WITH c AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice*100,0) AS BIGINT) AS VARCHAR),1,1) AS BIGINT) AS digit " +
      "FROM orders WHERE o_totalprice > 0), " +
      "nn AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1), " +
      "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM nn) " +
      "SELECT digit, n, CAST(n*1000000 // total AS BIGINT) AS share_ppm, " +
      s"CAST(list_extract($lst, CAST(digit AS INT)) AS BIGINT) AS benford_ppm, " +
      s"CAST(n*1000000 // total - list_extract($lst, CAST(digit AS INT)) AS BIGINT) AS dev_ppm " +
      "FROM nn, t ORDER BY digit"
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef("stats_linreg_trend", statsLinregTrend, Some(statsLinregTrendSql)),
    QueryDef("stats_chi2_terms", statsChi2Terms, Some(statsChi2TermsSql)),
    QueryDef("win_rolling_median", winRollingMedian, Some(winRollingMedianSql)),
    QueryDef("ts_cross_corr", tsCrossCorr, Some(tsCrossCorrSql)),
    QueryDef("tokenizer_bpe_pairs", tokenizerBpePairs, Some(tokenizerBpePairsSql)),
    QueryDef("dq_benford", dqBenford, Some(dqBenfordSql)),
  )
}
