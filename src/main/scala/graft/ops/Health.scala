package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-6 batch 10 — corpus/model/warehouse health verbs: tokenizer OOV
  * auditing, per-dimension embedding diagnostics, retrieval quality
  * (NDCG@10), Markov transition entropy, and order-free table content
  * checksums for cross-system reconciliation.
  *
  * Scale doctrine, per op:
  *   - tokenizer_oov_rate: the corpus collapses map-side to the
  *     (lang, token) count frame (vocabulary grain per language); the
  *     top-1000 vocab is a bounded broadcast; output is |langs| rows.
  *   - embed_dim_stats: posexplode → one partial-aggregable pass to
  *     |dims| rows; every moment is an exact BIGINT on the 1e-6 grid
  *     (the labelCentroids idiom), so means/variances are identical
  *     doubles in both engines with no rounding step.
  *   - ml_eval_ndcg: both the system and ideal rankings end in top-10
  *     prunes before any window; per-rank gains round to the 1e-6 grid
  *     before the exact cumulative DECIMAL sum (the surprisal idiom).
  *   - event_transition_entropy: one lead() pass over the user
  *     partitioning (shared shape with event_transition_probs); entropy
  *     terms at |types|² grain.
  *   - dq_table_checksum: per-row md5 folded to a 60-bit integer map-side,
  *     XOR-aggregated — commutative, associative, partial-aggregable, so
  *     the exchange is one row per table at ANY scale; the canonical row
  *     string uses integer cents / epoch-micros so no FP formatting ever
  *     enters the hash.
  */
object Health {

  // ------------------------------------------------------------------
  // tokenizer_oov_rate — out-of-vocabulary audit against a top-K vocab
  // ------------------------------------------------------------------

  private val VocabK = 1000

  /** Per-language OOV rate against the corpus-global top-1000 token
    * vocabulary (count desc, token asc ties) — the go/no-go audit before
    * freezing a tokenizer's vocab: which language pays the OOV tax?
    * Token and type OOV shares in integer ppm.
    */
  private def tokenizerOovRate(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables
      .documents(s, dir)
      .select(col("lang"), explode(split(Text.normText(col("text")), " ")).as("t"))
      .groupBy("lang", "t")
      .agg(nrows.as("n"))
    val vocab = cnt
      .groupBy("t")
      .agg(sum("n").as("tot"))
      .orderBy(col("tot").desc, col("t"))
      .limit(VocabK)
      .select(col("t"), lit(1L).as("in_vocab"))
    cnt
      .join(broadcast(vocab), Seq("t"), "left")
      .withColumn("oov", col("in_vocab").isNull.cast("long"))
      .groupBy("lang")
      .agg(
        sum("n").as("n_tokens"),
        sum(col("oov") * col("n")).as("n_oov_tokens"),
        nrows.as("n_types"),
        sum("oov").as("n_oov_types"),
      )
      .select(
        col("lang"),
        col("n_tokens"),
        col("n_oov_tokens"),
        expr("n_oov_tokens * 1000000 div n_tokens").as("oov_token_ppm"),
        col("n_types"),
        col("n_oov_types"),
        expr("n_oov_types * 1000000 div n_types").as("oov_type_ppm"),
      )
      .orderBy("lang")
  }

  private val normSql = "lower(trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')))"

  private val tokenizerOovRateSql =
    s"WITH tok AS (SELECT lang, unnest(string_split($normSql, ' ')) AS t FROM documents), " +
      "cnt AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2), " +
      s"vocab AS (SELECT t FROM (SELECT t, sum(n) AS tot FROM cnt GROUP BY 1) ORDER BY tot DESC, t LIMIT $VocabK), " +
      "m AS (SELECT lang, n, CASE WHEN v.t IS NULL THEN 1 ELSE 0 END AS oov " +
      "FROM cnt LEFT JOIN vocab v ON cnt.t = v.t) " +
      "SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens, CAST(sum(oov * n) AS BIGINT) AS n_oov_tokens, " +
      "CAST(sum(oov * n) * 1000000 // sum(n) AS BIGINT) AS oov_token_ppm, " +
      "CAST(count(*) AS BIGINT) AS n_types, CAST(sum(oov) AS BIGINT) AS n_oov_types, " +
      "CAST(sum(oov) * 1000000 // count(*) AS BIGINT) AS oov_type_ppm " +
      "FROM m GROUP BY 1 ORDER BY lang"

  // ------------------------------------------------------------------
  // embed_dim_stats — per-dimension embedding health diagnostics
  // ------------------------------------------------------------------

  /** Per-dimension mean/variance/range/zero-share of the embedding table —
    * the "dead or collapsed dimension" audit run before trusting a vector
    * space for retrieval. Components land on the exact 1e-6 integer grid
    * map-side (round(x·1e6) — the labelCentroids idiom), so every moment
    * is exact BIGINT and the derived doubles are bit-identical
    * cross-engine without a final rounding step.
    */
  private def embedDimStats(s: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(s, dir)
      .select(posexplode(transform(col("embedding"), _.cast("double"))).as(Seq("pos", "x")))
      .select(col("pos").cast("long").as("dim"), round(col("x") * 1e6, 0).cast("long").as("x6"))
      .groupBy("dim")
      .agg(
        nrows.as("n"),
        sum("x6").as("s6"),
        sum(col("x6") * col("x6")).as("q12"),
        sum((col("x6") === 0L).cast("long")).as("n_zero"),
        min("x6").as("min6"),
        max("x6").as("max6"),
      )
      .select(
        col("dim"),
        col("n"),
        (col("s6").cast(DoubleType) / col("n") / lit(1e6)).as("mean"),
        ((col("q12").cast(DoubleType) / col("n") -
          (col("s6").cast(DoubleType) / col("n")) * (col("s6").cast(DoubleType) / col("n"))) / lit(1e12))
          .as("variance"),
        col("min6"),
        col("max6"),
        expr("n_zero * 1000000 div n").as("zero_ppm"),
      )
      .orderBy("dim")

  private val embedDimStatsSql =
    "WITH d AS (SELECT unnest(list_transform(CAST(embedding AS DOUBLE[]), (x, i) -> " +
      "{'dim': CAST(i - 1 AS BIGINT), 'x6': CAST(round(x * 1e6, 0) AS BIGINT)})) AS u FROM embeddings), " +
      "m AS (SELECT u.dim AS dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(u.x6) AS BIGINT) AS s6, " +
      "CAST(sum(u.x6 * u.x6) AS BIGINT) AS q12, " +
      "CAST(sum(CASE WHEN u.x6 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero, " +
      "min(u.x6) AS min6, max(u.x6) AS max6 FROM d GROUP BY 1) " +
      "SELECT dim, n, CAST(s6 AS DOUBLE) / n / 1e6 AS mean, " +
      "(CAST(q12 AS DOUBLE) / n - (CAST(s6 AS DOUBLE) / n) * (CAST(s6 AS DOUBLE) / n)) / 1e12 AS variance, " +
      "min6, max6, n_zero * 1000000 // n AS zero_ppm " +
      "FROM m ORDER BY dim"

  // ------------------------------------------------------------------
  // ml_eval_ndcg — NDCG@10 of the BM25 ranking vs term-count relevance
  // ------------------------------------------------------------------

  /** Ranking quality of text_bm25_topk's scorer: graded relevance is the
    * number of distinct query terms a document contains (0..4), the system
    * ranking is BM25 (score desc, doc_id), the ideal ranking sorts the
    * same relevance pool descending. Reports DCG@k / IDCG@k / NDCG@k for
    * every cutoff k = 1..10. Per-rank gains rel/log2(rank+1) round to the
    * 1e-6 DECIMAL grid before the exact cumulative sum (log2 spelled
    * ln/ln(2) on both sides — the agg_entropy_mix rule); the shared BM25
    * scoring core ([[Retrieval.bm25Scores]]) cannot drift from the
    * operator it evaluates.
    */
  private def mlEvalNdcg(s: SparkSession, dir: String): DataFrame = {
    val rel = Tables
      .documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin(Retrieval.QueryTerms: _*))
      .groupBy("doc_id")
      .agg(countDistinct("t").as("rel"))
    val sysW = Window.orderBy(col("score").desc, col("doc_id"))
    val sys = Retrieval
      .bm25Scores(s, dir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
      .join(rel, "doc_id")
      .withColumn("rnk", asLong(row_number().over(sysW)))
    val idealW = Window.orderBy(col("rel").desc, col("doc_id"))
    val ideal = rel
      .orderBy(col("rel").desc, col("doc_id"))
      .limit(10)
      .withColumn("rnk", asLong(row_number().over(idealW)))
      .select(col("rnk"), col("rel").as("irel"))
    def gain(relCol: Column): Column =
      round(relCol.cast("double") / (log(col("rnk").cast("double") + 1) / log(lit(2.0))), 6)
        .cast(DecimalType(18, 6))
    // bounded: cumulative windows over the 10-row top-k frames
    val cum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    sys
      .select(col("rnk"), col("doc_id"), col("rel"), gain(col("rel")).as("g"))
      .join(ideal.select(col("rnk"), col("irel"), gain(col("irel")).as("ig")), "rnk")
      .select(
        col("rnk"),
        col("doc_id"),
        col("rel"),
        sum("g").over(cum).cast(DoubleType).as("dcg"),
        sum("ig").over(cum).cast(DoubleType).as("idcg"),
        round(
          sum("g").over(cum).cast(DoubleType) / sum("ig").over(cum).cast(DoubleType),
          6,
        ).as("ndcg"),
      )
      .orderBy("rnk")
  }

  private val mlEvalNdcgSql = {
    val terms = Retrieval.QueryTerms.map(t => s"'$t'").mkString(", ")
    s"WITH ${Retrieval.bm25ScoresCte}, " +
      "rel AS (SELECT doc_id, CAST(count(DISTINCT t) AS BIGINT) AS rel " +
      s"FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) WHERE t IN ($terms) GROUP BY 1), " +
      "sys AS (SELECT sc.doc_id, rel, CAST(row_number() OVER (ORDER BY score DESC, sc.doc_id) AS BIGINT) AS rnk " +
      "FROM (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10) sc JOIN rel USING (doc_id)), " +
      "ideal AS (SELECT CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS BIGINT) AS rnk, rel AS irel " +
      "FROM (SELECT doc_id, rel FROM rel ORDER BY rel DESC, doc_id LIMIT 10)), " +
      "g AS (SELECT s.rnk, s.doc_id, s.rel, " +
      "CAST(round(CAST(s.rel AS DOUBLE) / (ln(CAST(s.rnk AS DOUBLE) + 1) / ln(2)), 6) AS DECIMAL(18,6)) AS g, " +
      "CAST(round(CAST(i.irel AS DOUBLE) / (ln(CAST(i.rnk AS DOUBLE) + 1) / ln(2)), 6) AS DECIMAL(18,6)) AS ig " +
      "FROM sys s JOIN ideal i ON s.rnk = i.rnk) " +
      "SELECT rnk, doc_id, rel, " +
      "CAST(sum(g) OVER (ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS dcg, " +
      "CAST(sum(ig) OVER (ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS idcg, " +
      "round(CAST(sum(g) OVER (ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / " +
      "CAST(sum(ig) OVER (ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS ndcg " +
      "FROM g ORDER BY rnk"
  }

  // ------------------------------------------------------------------
  // event_transition_entropy — predictability of the event-type chain
  // ------------------------------------------------------------------

  /** Entropy (bits) of each event type's next-event distribution — the
    * behavioral-predictability complement of event_transition_probs,
    * sharing its lead()-over-user-partitioning transition frame. A type
    * whose followers are uniform scores log2(|types|); a deterministic
    * funnel step scores 0. Terms round to the 1e-6 grid before the exact
    * DECIMAL sum; dominance is the max follower share in integer ppm.
    */
  private def eventTransitionEntropy(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), expr("ts div 1000").as("us"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val tr = e
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(nrows.as("n"))
    val tot = tr.groupBy("from_type").agg(sum("n").as("n_from"), nrows.as("n_dest"))
    val p = col("n").cast("double") / col("n_from").cast("double")
    tr.join(broadcast(tot), "from_type") // |types|² rows
      .select(
        col("from_type"),
        col("n_from"),
        col("n_dest"),
        round(-p * log(p) / log(lit(2.0)), 6).cast(DecimalType(18, 6)).as("h6"),
        expr("n * 1000000 div n_from").as("p_ppm"),
      )
      .groupBy("from_type")
      .agg(
        min("n_from").as("n_from"),
        min("n_dest").as("n_dest"),
        sum("h6").cast(DoubleType).as("entropy_bits"),
        max("p_ppm").as("top_share_ppm"),
      )
      .orderBy("from_type")
  }

  private val eventTransitionEntropySql =
    // order the lead() on the µs grid + event_id exactly as the Spark side
    // (ts div 1000): raw TIMESTAMP_NS ordering could tie-break differently
    // for same-user events sharing a µs but differing at ns
    "WITH tr AS (SELECT event_type AS from_type, " +
      "lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id) AS to_type FROM events), " +
      "cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM tr " +
      "WHERE to_type IS NOT NULL GROUP BY 1, 2), " +
      "tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from, CAST(count(*) AS BIGINT) AS n_dest " +
      "FROM cnt GROUP BY 1), " +
      "t AS (SELECT c.from_type, t.n_from, t.n_dest, " +
      "CAST(round(-(CAST(n AS DOUBLE) / n_from) * ln(CAST(n AS DOUBLE) / n_from) / ln(2), 6) " +
      "AS DECIMAL(18,6)) AS h6, n * 1000000 // n_from AS p_ppm " +
      "FROM cnt c JOIN tot t USING (from_type)) " +
      "SELECT from_type, min(n_from) AS n_from, min(n_dest) AS n_dest, " +
      "CAST(sum(h6) AS DOUBLE) AS entropy_bits, CAST(max(p_ppm) AS BIGINT) AS top_share_ppm " +
      "FROM t GROUP BY 1 ORDER BY from_type"

  // ------------------------------------------------------------------
  // dq_table_checksum — order-free content signature per table
  // ------------------------------------------------------------------

  /** Cross-system reconciliation checksums: each row canonicalizes to a
    * pipe-joined string of exact integers/strings (cents, epoch-micros —
    * no FP formatting), md5-folds to a 60-bit integer, and XOR-aggregates
    * per table. XOR is commutative/associative ⇒ fully partial-aggregable
    * and order-free: the exchange carries ONE row per table at any scale,
    * and two systems agree iff (n_rows, xor_sig) agree (modulo the usual
    * multiset-xor caveat, which the count plus min/max witnesses guard).
    * Every field coalesces to a \u0001NULL sentinel BEFORE concat_ws:
    * concat_ws silently skips NULL args, so without the sentinel two rows
    * differing only in WHICH field is NULL (or NULL vs empty string)
    * canonicalize identically and the checksum cannot see the difference.
    */
  /** Per-field canonicalization for the checksum: the \u0001 prefix keeps
    * the sentinel disjoint from any real value — a column literally
    * containing the string "NULL" must not collide, and two rows differing
    * only in WHICH field is NULL must not either. Mirrored verbatim by the
    * DuckDB oracle's `chr(1) || 'NULL'` (dqTableChecksumSql below);
    * HealthSpec exercises the NULL-bearing cases both engines must agree
    * on even though the TPC-H fixtures are NULL-free.
    */
  def checksumField(c: Column): Column = coalesce(c.cast("string"), lit("\u0001NULL"))

  private def dqTableChecksum(s: SparkSession, dir: String): DataFrame = {
    def f(c: Column): Column = checksumField(c)
    def sig(df: DataFrame, table: String, canon: Column): DataFrame =
      df.select(conv(substring(md5(canon), 1, 15), 16, 10).cast("long").as("h"))
        .agg(
          nrows.as("n_rows"),
          expr("bit_xor(h)").as("xor_sig"),
          min("h").as("min_h"),
          max("h").as("max_h"),
        )
        .select(lit(table).as("table_name"), col("n_rows"), col("xor_sig"), col("min_h"), col("max_h"))
    val o = sig(
      Tables.orders(s, dir),
      "orders",
      concat_ws(
        "|",
        f(col("o_orderkey")),
        f(col("o_custkey")),
        f(col("o_orderstatus")),
        f(round(col("o_totalprice") * 100, 0).cast("long")),
        f(unix_micros(col("o_orderdate").cast("timestamp"))),
        f(col("o_orderpriority")),
      ),
    )
    val l = sig(
      Tables.lineitem(s, dir),
      "lineitem",
      concat_ws(
        "|",
        f(col("l_orderkey")),
        f(col("l_linenumber")),
        f(col("l_partkey")),
        f(col("l_suppkey")),
        f(round(col("l_quantity"), 0).cast("long")),
        f(round(col("l_extendedprice") * 100, 0).cast("long")),
        f(round(col("l_discount") * 100, 0).cast("long")),
        f(round(col("l_tax") * 100, 0).cast("long")),
        f(col("l_returnflag")),
        f(col("l_linestatus")),
        f(unix_micros(col("l_shipdate").cast("timestamp"))),
      ),
    )
    val c = sig(
      Tables.customer(s, dir),
      "customer",
      concat_ws(
        "|",
        f(col("c_custkey")),
        f(col("c_name")),
        f(col("c_nationkey")),
        f(round(col("c_acctbal") * 100, 0).cast("long")),
        f(col("c_mktsegment")),
      ),
    )
    o.unionByName(l).unionByName(c).orderBy("table_name")
  }

  private val dqTableChecksumSql = {
    // mirror of the Spark-side f(): chr(1) || 'NULL' sentinel per field
    def cf(x: String): String = s"coalesce(CAST($x AS VARCHAR), chr(1) || 'NULL')"
    def cw(xs: String*): String = xs.map(cf).mkString("concat_ws('|', ", ", ", ")")
    def sig(table: String, canon: String): String =
      s"SELECT '$table' AS table_name, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(bit_xor(h) AS BIGINT) AS xor_sig, min(h) AS min_h, max(h) AS max_h FROM " +
        s"(SELECT ('0x' || substr(md5($canon), 1, 15))::BIGINT AS h FROM $table)"
    sig(
      "orders",
      cw("o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(round(o_totalprice * 100, 0) AS BIGINT)", "epoch_us(o_orderdate)", "o_orderpriority"),
    ) + " UNION ALL " + sig(
      "lineitem",
      cw("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "CAST(round(l_quantity, 0) AS BIGINT)", "CAST(round(l_extendedprice * 100, 0) AS BIGINT)",
        "CAST(round(l_discount * 100, 0) AS BIGINT)", "CAST(round(l_tax * 100, 0) AS BIGINT)",
        "l_returnflag", "l_linestatus", "epoch_us(l_shipdate)"),
    ) + " UNION ALL " + sig(
      "customer",
      cw("c_custkey", "c_name", "c_nationkey",
        "CAST(round(c_acctbal * 100, 0) AS BIGINT)", "c_mktsegment"),
    ) + " ORDER BY table_name"
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef("tokenizer_oov_rate", tokenizerOovRate, Some(tokenizerOovRateSql)),
    QueryDef("embed_dim_stats", embedDimStats, Some(embedDimStatsSql)),
    QueryDef("ml_eval_ndcg", mlEvalNdcg, Some(mlEvalNdcgSql)),
    QueryDef("event_transition_entropy", eventTransitionEntropy, Some(eventTransitionEntropySql)),
    QueryDef("dq_table_checksum", dqTableChecksum, Some(dqTableChecksumSql)),
  )
}
