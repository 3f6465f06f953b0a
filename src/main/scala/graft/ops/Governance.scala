package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 batch 7 — data-governance & corpus-curation verbs: the
  * key-uniqueness audit, the training-data mix card, deterministic
  * class-balanced downsampling, URL component parsing (the native
  * `parse_url` surface), and the l-diversity privacy audit that
  * complements privacy_k_anonymity.
  *
  * Scale doctrine, per op:
  *   - dq_uniqueness: each audit is one map-side-combined groupBy on its
  *     key followed by a 1-row reduction — the key-grain frame never
  *     leaves the shuffle that built it; output is |audits| rows.
  *   - corpus_mix_report: one corpus scan aggregates to the
  *     |sources|×|langs| mix grain; the share/cumulative windows run over
  *     that bounded frame (the vocab_coverage boundedness rule).
  *   - sample_balanced_class: the per-class ranked selection sorts each
  *     class by a seedless md5 priority. Classes are few but corpus-sized,
  *     so at 100 TB the documented degradation is priority-threshold
  *     selection: take the ~(k/n)-quantile of the priority per class
  *     (approx sketch), filter below it map-side, and rank only the
  *     near-threshold sliver exactly — same output, no full sort.
  *   - fn_url_parse: pure per-row parsing, zero exchanges.
  *   - privacy_l_diversity: orders join customers on the dimension key,
  *     one grouping to |QI-groups| rows, then an |l-levels| histogram.
  */
object Governance {

  // ------------------------------------------------------------------
  // dq_uniqueness — key-uniqueness audit across the schema
  // ------------------------------------------------------------------

  /** Uniqueness audit across candidate keys: rows, distinct keys, rows
    * living under duplicated keys, and the worst multiplicity. NULL-key
    * rows count as a key value (this audit reports presence,
    * dq_referential_integrity reports nullness). On this corpus it
    * exposes a real generator fact: both id columns are unique, but BOTH
    * lineitem grains fan out — even (l_orderkey, l_linenumber) collides
    * (line numbers are drawn randomly, max multiplicity 5 at sf0.001) —
    * exactly the discovery this audit exists to make before a pipeline
    * assumes a merge key.
    */
  private def dqUniqueness(s: SparkSession, dir: String): DataFrame = {
    def audit(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(nrows.as("c"))
        .agg(
          sum("c").as("n_rows"),
          nrows.as("n_keys"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_rows"),
          max("c").as("max_mult"),
        )
        .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"), col("n_dup_rows"), col("max_mult"))
    audit("documents.doc_id", Tables.documents(s, dir), Seq("doc_id"))
      .unionByName(audit("events.event_id", Tables.events(s, dir), Seq("event_id")))
      .unionByName(audit("lineitem.l_orderkey", Tables.lineitem(s, dir), Seq("l_orderkey")))
      .unionByName(
        audit("lineitem.l_orderkey+l_linenumber", Tables.lineitem(s, dir), Seq("l_orderkey", "l_linenumber"))
      )
      .unionByName(audit("orders.o_orderkey", Tables.orders(s, dir), Seq("o_orderkey")))
      .orderBy("key_name")
  }

  private val dqUniquenessSql = {
    def audit(name: String, table: String, keys: String): String =
      s"SELECT '$name' AS key_name, CAST(sum(c) AS BIGINT) AS n_rows, " +
        "CAST(count(*) AS BIGINT) AS n_keys, " +
        "CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows, " +
        "CAST(max(c) AS BIGINT) AS max_mult " +
        s"FROM (SELECT count(*) AS c FROM $table GROUP BY $keys)"
    audit("documents.doc_id", "documents", "doc_id") +
      " UNION ALL " + audit("events.event_id", "events", "event_id") +
      " UNION ALL " + audit("lineitem.l_orderkey", "lineitem", "l_orderkey") +
      " UNION ALL " + audit("lineitem.l_orderkey+l_linenumber", "lineitem", "l_orderkey, l_linenumber") +
      " UNION ALL " + audit("orders.o_orderkey", "orders", "o_orderkey") +
      " ORDER BY key_name"
  }

  // ------------------------------------------------------------------
  // corpus_mix_report — the training-data mix card
  // ------------------------------------------------------------------

  /** The data-mix card a training run is configured from: per
    * (source, lang) cell, document and whitespace-token counts, the
    * cell's token share (ppm of the corpus), and cumulative coverage in
    * token-descending order — "the top N cells cover X% of training
    * tokens". Token counting matches text_stats_lang (split on single
    * space). The share/cumulative windows are unpartitioned but run over
    * the |sources|×|langs|-bounded mix frame (vocab_coverage rule), never
    * doc grain; ties in the ordering break on (source, lang).
    */
  private def corpusMixReport(s: SparkSession, dir: String): DataFrame = {
    val mix = Tables
      .documents(s, dir)
      .groupBy("source", "lang")
      .agg(nrows.as("n_docs"), sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    // |sources|×|langs|-bounded unpartitioned windows (mix grain, ≤ ~125
    // cells on this corpus shape)
    val ord = Window.orderBy(col("n_tokens").desc, col("source"), col("lang"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mix
      .withColumn("total", sum("n_tokens").over(Window.partitionBy()))
      .withColumn("rnk", asLong(row_number().over(ord)))
      .withColumn("cum_tokens", sum("n_tokens").over(run))
      .select(
        col("rnk"),
        col("source"),
        col("lang"),
        col("n_docs"),
        col("n_tokens"),
        expr("n_tokens * 1000000 div total").as("share_ppm"),
        expr("cum_tokens * 1000000 div total").as("cum_ppm"),
      )
      .orderBy("rnk")
  }

  private val corpusMixReportSql =
    "WITH mix AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs, " +
      "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens FROM documents GROUP BY 1, 2), " +
      "w AS (SELECT *, CAST(sum(n_tokens) OVER () AS BIGINT) AS total, " +
      "CAST(row_number() OVER (ORDER BY n_tokens DESC, source, lang) AS BIGINT) AS rnk, " +
      "CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, source, lang " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM mix) " +
      "SELECT rnk, source, lang, n_docs, n_tokens, " +
      "CAST(n_tokens * 1000000 // total AS BIGINT) AS share_ppm, " +
      "CAST(cum_tokens * 1000000 // total AS BIGINT) AS cum_ppm " +
      "FROM w ORDER BY rnk"

  // ------------------------------------------------------------------
  // sample_balanced_class — deterministic class-balanced downsample
  // ------------------------------------------------------------------

  /** Class-rebalancing downsample: every class keeps exactly
    * k = min(class count) rows, selected as the bottom-k by the seedless
    * md5 priority (the repo-wide hash52 uniform) — deterministic,
    * engine-agnostic, and unbiased within class. Output is the selected
    * row set itself (the operator a pipeline actually consumes).
    */
  private def sampleBalancedClass(s: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(s, dir)
      .select(
        col("l_returnflag"),
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        hash52("bal#", col("l_orderkey") * 8 + col("l_linenumber")).as("prio"),
      )
    val kmin = li
      .groupBy("l_returnflag")
      .agg(nrows.as("nc"))
      .agg(min("nc").as("k"))
    // per-class priority rank via ScaleRank — k is data-derived (min class
    // count), so the rank filter can't map-side-prune like a literal top-k
    // (no WindowGroupLimit), and the r6 per-class window task held the
    // whole class; the range-split rank removes that ceiling
    ScaleRank
      .rankedFrame(
        li,
        Seq("l_returnflag"),
        Seq(col("prio"), col("l_orderkey"), col("l_linenumber")),
        None,
      )
      .join(broadcast(kmin)) // 1-row class-minimum frame
      .filter(col("__rn") <= col("k"))
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
  }

  private val sampleBalancedClassSql =
    s"WITH li AS (SELECT l_returnflag, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, " +
      s"${graft.Qf.hash52Sql("bal#", "(l_orderkey * 8 + l_linenumber)")} AS prio FROM lineitem), " +
      "k AS (SELECT min(nc) AS k FROM (SELECT CAST(count(*) AS BIGINT) AS nc FROM li GROUP BY l_returnflag)), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag " +
      "ORDER BY prio, l_orderkey, l_linenumber) AS rn FROM li) " +
      "SELECT l_returnflag, l_orderkey, l_linenumber FROM r, k WHERE rn <= k.k " +
      "ORDER BY l_returnflag, l_orderkey, l_linenumber"

  // ------------------------------------------------------------------
  // fn_url_parse — URL component extraction (native parse_url)
  // ------------------------------------------------------------------

  /** URL component parsing over the shared messy-URL synthesizer
    * (CorpusPrep.urlSynth — same column, same SQL CTE, so the input can
    * never drift from dedup_url_norm's): protocol, host, port, path,
    * query and fragment via Spark's codegen'd `parse_url` (port via
    * regexp — parse_url has no PORT part). Missing components are NULL in
    * both engines (DuckDB regexp_extract returns '' on no-match; the
    * oracle nullif-wraps every extract to mirror parse_url's NULLs).
    */
  private def fnUrlParse(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(col("doc_id"), CorpusPrep.urlSynth.as("url"))
      .select(
        col("doc_id"),
        col("url"),
        expr("parse_url(url, 'PROTOCOL')").as("scheme"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("nullif(regexp_extract(url, '^[A-Za-z]+://[^/:?#]+:([0-9]+)', 1), '')").cast("long").as("port"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'REF')").as("fragment"),
      )
      .orderBy("doc_id")

  private val fnUrlParseSql =
    s"WITH ${CorpusPrep.urlSynthCte} " +
      "SELECT doc_id, url, " +
      "nullif(regexp_extract(url, '^([A-Za-z]+)://', 1), '') AS scheme, " +
      "nullif(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1), '') AS host, " +
      "CAST(nullif(regexp_extract(url, '^[A-Za-z]+://[^/:?#]+:([0-9]+)', 1), '') AS BIGINT) AS port, " +
      "nullif(regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1), '') AS path, " +
      "nullif(regexp_extract(url, '\\?([^#]*)', 1), '') AS query, " +
      "nullif(regexp_extract(url, '#(.*)$', 1), '') AS fragment " +
      "FROM synth ORDER BY doc_id"

  // ------------------------------------------------------------------
  // privacy_l_diversity — sensitive-attribute diversity audit
  // ------------------------------------------------------------------

  /** l-diversity audit complementing privacy_k_anonymity: same
    * quasi-identifier (nation, market segment, balance band), sensitive
    * attribute = order priority of the customer's orders. Per QI group,
    * l = distinct sensitive values; reported as the l-distribution with
    * the homogeneity flag l < 3 (a k-anonymous group with one priority
    * value still leaks the attribute — the failure k-anonymity misses).
    */
  private def privacyLDiversity(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(
        col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
      )
      .agg(nrows.as("n_orders"), countDistinct(col("o_orderpriority")).as("l"))
      .groupBy("l")
      .agg(nrows.as("n_groups"), sum("n_orders").as("n_orders"))
      .withColumn("homogeneous_risk", col("l") < 3)
      .orderBy("l")

  private val privacyLDiversitySql =
    "WITH qi AS (SELECT c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band, " +
      "CAST(count(*) AS BIGINT) AS n_orders, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l " +
      "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2, 3) " +
      "SELECT l, CAST(count(*) AS BIGINT) AS n_groups, CAST(sum(n_orders) AS BIGINT) AS n_orders, " +
      "l < 3 AS homogeneous_risk FROM qi GROUP BY l ORDER BY l"

  /** t-closeness audit — the third rung of the privacy-audit ladder after
    * privacy_k_anonymity (group size) and privacy_l_diversity (distinct
    * sensitive values): a group can be large AND diverse yet still leak if
    * its sensitive-value DISTRIBUTION differs sharply from the corpus
    * (e.g. 90% URGENT where the corpus is 20%). Same QI (nation, market
    * segment, balance band), sensitive = order priority. Per group,
    * t = total-variation distance between the group's priority distribution
    * and the global one — for categorical attributes TVD is the standard
    * EMD instance: t = ½·Σ_v |p_g(v) − p(v)|. All arithmetic is integer
    * ppm (n·1e6 div N — identical truncation in both engines), the value
    * domain is completed per group (absent priorities contribute |0 − p|)
    * by a broadcast cross join with the 5-row priority frame, and the
    * output is the t-distribution: groups bucketed by TVD decile with the
    * t > 0.3 breach flag. Scale: every aggregate is QI- or
    * |priorities|-grain with map-side combine; the domain completion is
    * |QI|×5 via broadcast — nothing row-grain survives the first groupBy.
    */
  private def privacyTCloseness(s: SparkSession, dir: String): DataFrame = {
    val oc = Tables
      .orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
        col("o_orderpriority").as("prio"),
      )
    val qi = Seq("c_nationkey", "c_mktsegment", "bal_band")
    val gv = oc.groupBy((qi :+ "prio").map(col): _*).agg(nrows.as("n_gv"))
    val g = oc.groupBy(qi.map(col): _*).agg(nrows.as("n_g"))
    val v = oc
      .groupBy("prio")
      .agg(nrows.as("n_v"))
      .crossJoin(broadcast(oc.agg(nrows.as("n_all"))))
      .select(col("prio"), expr("n_v * 1000000 div n_all").as("p_ppm"))
    val dom = g.crossJoin(broadcast(v)) // |QI| × 5 — the completed domain
    val tvd = dom
      .join(gv, qi :+ "prio", "left")
      .select(
        (qi.map(col) :+ col("n_g") :+
          abs(expr("coalesce(n_gv, 0) * 1000000 div n_g") - col("p_ppm")).as("dev")): _*
      )
      .groupBy((qi :+ "n_g").map(col): _*)
      .agg(expr("sum(dev) div 2").as("t_ppm"))
    tvd
      .groupBy(expr("t_ppm div 100000").as("t_decile"))
      .agg(
        nrows.as("n_groups"),
        sum("n_g").as("n_orders"),
        max("t_ppm").as("max_t_ppm"),
      )
      .withColumn("breach_03", col("max_t_ppm") > 300000L)
      .orderBy("t_decile")
  }

  private val privacyTClosenessSql =
    "WITH oc AS (SELECT c_nationkey, c_mktsegment, " +
      "CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band, o_orderpriority AS prio " +
      "FROM orders JOIN customer ON o_custkey = c_custkey), " +
      "gv AS (SELECT c_nationkey, c_mktsegment, bal_band, prio, CAST(count(*) AS BIGINT) AS n_gv " +
      "FROM oc GROUP BY 1, 2, 3, 4), " +
      "g AS (SELECT c_nationkey, c_mktsegment, bal_band, CAST(count(*) AS BIGINT) AS n_g " +
      "FROM oc GROUP BY 1, 2, 3), " +
      "nall AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM oc), " +
      "v AS (SELECT prio, CAST(count(*) * 1000000 // n_all AS BIGINT) AS p_ppm " +
      "FROM oc, nall GROUP BY prio, n_all), " +
      "tvd AS (SELECT g.c_nationkey, g.c_mktsegment, g.bal_band, g.n_g, " +
      "CAST(sum(abs(coalesce(gv.n_gv, 0) * 1000000 // g.n_g - v.p_ppm)) // 2 AS BIGINT) AS t_ppm " +
      "FROM g CROSS JOIN v LEFT JOIN gv ON gv.c_nationkey = g.c_nationkey " +
      "AND gv.c_mktsegment = g.c_mktsegment AND gv.bal_band = g.bal_band AND gv.prio = v.prio " +
      "GROUP BY 1, 2, 3, 4) " +
      "SELECT CAST(t_ppm // 100000 AS BIGINT) AS t_decile, CAST(count(*) AS BIGINT) AS n_groups, " +
      "CAST(sum(n_g) AS BIGINT) AS n_orders, CAST(max(t_ppm) AS BIGINT) AS max_t_ppm, " +
      "max(t_ppm) > 300000 AS breach_03 FROM tvd GROUP BY 1 ORDER BY t_decile"

  // ------------------------------------------------------------------
  // privacy_dp_counts — ε-DP histogram release of corpus counts (r12)
  // ------------------------------------------------------------------

  /** Differentially-private histogram release (Dwork et al. 2006, the
    * Laplace mechanism): per (lang, source) document counts with Laplace
    * noise at ε = 1, sensitivity 1 (add/remove one document moves one
    * cell by one) — the mechanism a curator uses to publish corpus
    * composition without revealing any single document's presence.
    * Noise is the seedless-md5 idiom shared with sample_importance_dsir:
    * u = (hash52("dp#", lang|source) + 0.5) / 2^52 — exactly
    * representable, identical in both engines — and the Laplace inverse
    * CDF ln(2u) / −ln(2(1−u)) is the one transcendental, rounded to the
    * 1e-6 DECIMAL grid to absorb libm ULP drift before the exact decimal
    * add (the surprisal idiom).
    *
    * ⚠ AS SHIPPED THIS PROVIDES ZERO DIFFERENTIAL PRIVACY (r12 advice):
    * the noise is a deterministic function of the PUBLISHED group key, so
    * anyone who knows the mechanism inverts it exactly and recovers the
    * true counts — and the true count column is emitted anyway so the
    * noise law is spec-checkable. This key demonstrates the mechanism
    * ARITHMETIC on the exact cross-engine grid (what the oracle can
    * hash-gate); it is NOT a release path. A production lift must
    * (a) replace the hash-seeded u with a fresh cryptographic uniform
    * draw per release — not merely a different seed — and (b) drop the
    * true-count column. The output column is named `n_dp6` with this
    * caveat to deter copy-paste misuse; treat any deterministic-noise
    * variant as a demo, never a privacy guarantee.
    *
    * Scale: one map-side-combined groupBy to the |langs|×|sources| grain;
    * noise is per-GROUP arithmetic on that bounded frame. Zero joins.
    */
  private def privacyDpCounts(s: SparkSession, dir: String): DataFrame = {
    val g = Tables
      .documents(s, dir)
      .groupBy("lang", "source")
      .agg(nrows.as("n"))
    val u =
      (hash52("dp#", concat(col("lang"), lit("|"), col("source"))) + lit(0.5)) / lit(Hash52Range)
    val noise =
      when(u < 0.5, log(lit(2.0) * u)).otherwise(-log(lit(2.0) * (lit(1.0) - u)))
    g.withColumn("noise6", round(noise, 6).cast(DecimalType(18, 6)))
      .select(
        col("lang"),
        col("source"),
        col("n"),
        // decimal-grid add, then a single exact DECIMAL→DOUBLE conversion
        // (|n_dp6|·1e6 < 2^53) — DECIMAL itself can't be the declared type
        // (SURVEY §2.0 rule 6: pandas coerces it to object/float64)
        (col("n").cast(DecimalType(18, 6)) + col("noise6"))
          .cast(DecimalType(18, 6))
          .cast("double")
          .as("n_dp6"),
      )
      .orderBy("lang", "source")
  }

  private val privacyDpCountsSql =
    "WITH g AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2), " +
      s"un AS (SELECT lang, source, n, (${hash52Sql("dp#", "lang || '|' || source")} + 0.5) / $Hash52Range AS u FROM g) " +
      "SELECT lang, source, n, CAST(CAST(CAST(n AS DECIMAL(18,6)) + " +
      "CAST(round(CASE WHEN u < 0.5 THEN ln(2*u) ELSE -ln(2*(1-u)) END, 6) AS DECIMAL(18,6)) " +
      "AS DECIMAL(18,6)) AS DOUBLE) AS n_dp6 FROM un ORDER BY lang, source"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("dq_uniqueness", dqUniqueness, Some(dqUniquenessSql)),
    QueryDef("privacy_dp_counts", privacyDpCounts, Some(privacyDpCountsSql)),
    QueryDef("corpus_mix_report", corpusMixReport, Some(corpusMixReportSql)),
    QueryDef("sample_balanced_class", sampleBalancedClass, Some(sampleBalancedClassSql)),
    QueryDef("fn_url_parse", fnUrlParse, Some(fnUrlParseSql)),
    QueryDef("privacy_l_diversity", privacyLDiversity, Some(privacyLDiversitySql)),
    QueryDef("privacy_t_closeness", privacyTCloseness, Some(privacyTClosenessSql)),
  )
}
