package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-quality pack for training-data curation: quality scoring, token
  * counting, language-ID scoring, rolling-hash fingerprints. All pure
  * Column arithmetic over exact ratios (round(4) declared), one explode +
  * one doc_id shuffle at most — every op scales linearly in corpus size.
  *
  * THE FORMULAS ARE THE ORACLE CONTRACT (mirrored verbatim in DuckDB):
  *   alpha_ratio    = |[a-z] chars| / n_chars
  *   stop_ratio     = |tokens ∈ STOP| / n_tokens
  *   mean_word_len  = (n_chars − (n_tokens−1)) / n_tokens
  *   quality        = (5·alpha₄ + 3·(10000−stop₄) + 2·min(10000, 200·n_tokens)) / 100000
  * where alpha₄/stop₄ are the 4-decimal ratios rescaled to exact integers —
  * the weighted sum happens in BIGINT (the double form 0.5a+0.3(1−s)+…
  * lands on round-half boundaries systematically and the engines' last ULP
  * differs); the single final division of identical integers is
  * bit-identical everywhere.
  */
object TextQuality {

  private val Stop = Seq("the", "a", "and", "of", "to")

  /** Per-language function-word profiles for the n-gram/stopword language-ID
    * heuristic. NOTE on the fixture corpus: every language label draws from
    * the same 31-word vocabulary (measured — zero per-language signal), so
    * accuracy is untestable here by construction; the declared query checks
    * the MECHANISM (deterministic profile scores + argmax) cross-engine,
    * which is what transfers to a real corpus.
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "ist", "von"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"),
  )

  private def w: Column = split(col("text"), " ")
  private def nTokens: Column = size(w)

  private def ratioIn(words: Seq[String]): Column =
    round(size(filter(w, t => t.isInCollection(words))).cast("double") / nTokens, 4)

  private def alphaRatio: Column =
    round(
      length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") / length(col("text")),
      4,
    )

  /** The composite quality score as a reusable Column over a `text` column —
    * exact scaled-integer weighted sum, one final division (see object doc).
    */
  def qualityCol: Column = {
    val ai = round(alphaRatio * 10000, 0).cast("long")
    val si = round(ratioIn(Stop) * 10000, 0).cast("long")
    val tf = least(lit(10000L), nTokens.cast("long") * 200L)
    (lit(5L) * ai + lit(3L) * (lit(10000L) - si) + lit(2L) * tf).cast("double") / 100000.0
  }

  private def textQuality(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nTokens.cast("long").as("n_tokens"),
        alphaRatio.as("alpha_ratio"),
        ratioIn(Stop).as("stop_ratio"),
        round((length(col("text")) - (nTokens - 1)).cast("double") / nTokens, 4).as("mean_word_len"),
        qualityCol.as("quality"),
      )
      .orderBy("doc_id")

  /** Whitespace tokens vs a BPE-ish regex tokenization ([a-z]+ | digits |
    * single other char) vs distinct types — the three token counts a
    * curation pipeline budgets with.
    */
  private def textTokenCount(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        nTokens.cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("re_tokens"),
        size(array_distinct(w)).cast("long").as("uniq_tokens"),
      )
      .orderBy("doc_id")

  /** Language-ID over any (doc_id, lang, text) frame: per-profile stopword
    * ratios + fixed-priority argmax. Public so LangidSpec can run it on a
    * discriminative fixture corpus (the driver's documents table shares one
    * vocabulary across all lang labels, so accuracy there is uninformative).
    */
  /** Predicted language as a reusable Column: fixed argmax priority
    * en > de > es > fr > zh (mirrored in the oracle) — first language whose
    * score >= every other wins.
    */
  def predLangCol: Column = {
    val byLang = Profiles.map { case (l, words) => l -> ratioIn(words) }.toMap
    val langs = Profiles.map(_._1)
    langs.init.foldRight(lit(langs.last): Column) { (l, els) =>
      val sc = byLang(l)
      val beatsRest = langs.filter(_ != l).map(o => sc >= byLang(o)).reduce(_ && _)
      when(beatsRest, lit(l)).otherwise(els)
    }
  }

  def langid(df: DataFrame): DataFrame = {
    val scores = Profiles.map { case (l, words) => l -> ratioIn(words) }
    val pred = predLangCol
    df.select(
      Seq(col("doc_id")) ++
        scores.map { case (l, c) => c.as(s"s_$l") } ++
        Seq(pred.as("pred_lang"), (pred === col("lang")).as("label_match")): _*
    ).orderBy("doc_id")
  }

  private def textLangid(s: SparkSession, dir: String): DataFrame =
    langid(Tables.documents(s, dir))

  /** Repetition signals (the Gopher-style quality filters): fraction of
    * tokens taken by the most frequent token, fraction of duplicate tokens,
    * fraction of bigrams taken by the most frequent bigram. Explode →
    * two-level aggregate: the shuffle key is (doc_id, token), so partial
    * (map-side) aggregation collapses repeats before the exchange and the
    * per-doc reduce sees at most |vocab(doc)| rows — linear in corpus size,
    * no per-doc quadratic scan.
    */
  def repetition(df: DataFrame): DataFrame = {
    val tstat = df
      .select(col("doc_id"), explode(w).as("t"))
      .groupBy("doc_id", "t")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").cast("long").as("n_tokens"),
        max("c").cast("long").as("top_token"),
        count(lit(1)).cast("long").as("uniq_tokens"),
      )
    // bigram_i = tokens[i] + " " + tokens[i+1]: zip tokens with themselves
    // shifted by one; the unpaired tail slot is null → filtered out
    val bigrams = filter(
      zip_with(w, slice(w, lit(2), size(w)), (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull,
    )
    val bstat = df
      .select(col("doc_id"), explode(bigrams).as("b"))
      .groupBy("doc_id", "b")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").cast("long").as("top_bigram"), sum("c").cast("long").as("n_bigrams"))
    tstat
      .join(bstat, "doc_id") // docs with < 2 tokens have no bigrams and drop
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("top_token").cast("double") / col("n_tokens"), 4).as("top_token_frac"),
        round((col("n_tokens") - col("uniq_tokens")).cast("double") / col("n_tokens"), 4)
          .as("dup_token_frac"),
        round(col("top_bigram").cast("double") / col("n_bigrams"), 4).as("top_bigram_frac"),
      )
      .orderBy("doc_id")
  }

  /** The end-to-end curation pass a training-data pipeline runs: exact
    * dedup (keep the smallest doc_id per md5(text)), drop low-quality docs,
    * keep docs whose predicted language matches their label. Dedup is the
    * only shuffle (32-byte md5 keys + a doc_id equi-join); quality and
    * language-ID are pure per-row column arithmetic fused into one
    * projection — at 100 TB this pipeline is one exchange, not three.
    */
  def curationPipeline(docs: DataFrame, minQuality: Double): DataFrame = {
    val keepers = docs
      .groupBy(md5(col("text")).as("k"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id") // scales with corpus: no broadcast hint, AQE decides
    docs
      .join(keepers, "doc_id")
      .select(
        col("doc_id"),
        col("lang"),
        nTokens.cast("long").as("n_tokens"),
        qualityCol.as("quality"),
        predLangCol.as("pred_lang"),
      )
      .filter(col("quality") >= minQuality && col("pred_lang") === col("lang"))
      .select("doc_id", "n_tokens", "quality", "pred_lang")
      .orderBy("doc_id")
  }

  /** Rolling-hash document fingerprint (winnowing-style): md5-derived hashes
    * of every 8-char window, keep the 4 smallest distinct — a fixed-width
    * signature robust to small edits, cross-engine exact thanks to md5.
    * Declared output joins the signature to a comma string — array columns
    * crash the driver's pandas hasher (§2.0 rule 7).
    */
  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)))).as("i"),
      )
      .select(
        col("doc_id"),
        expr("cast(conv(substring(md5(substring(text, i, 8)), 1, 15), 16, 10) AS BIGINT)").as("h"),
      )
      .groupBy("doc_id")
      .agg(
        concat_ws(",", transform(slice(sort_array(collect_set(col("h"))), 1, 4), _.cast("string")))
          .as("fp")
      )
      .orderBy("doc_id")

  // ------------------------------------------------------------- catalog

  /** DuckDB fragments mirroring alphaRatio / ratioIn(Stop) over columns
    * named `text` and `w`, and the composite quality over columns named
    * `alpha_ratio` / `stop_ratio` / `n_tokens`. EVERY oracle string that
    * needs the quality formula (qualitySql, curationSql, Curation's
    * quantile filter) interpolates these — a hand-inlined copy would let
    * one constant drift and surface only as an opaque hash mismatch.
    */
  val alphaRatioSql: String =
    "round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text), 4)"

  val stopRatioSql: String = {
    val lst = Stop.map(x => s"'$x'").mkString(",")
    s"round(CAST(len(list_filter(w, t -> t IN ($lst))) AS DOUBLE) / len(w), 4)"
  }

  val qualityFromPartsSql: String =
    "CAST(5 * CAST(round(alpha_ratio * 10000, 0) AS BIGINT) " +
      "+ 3 * (10000 - CAST(round(stop_ratio * 10000, 0) AS BIGINT)) " +
      "+ 2 * least(10000, n_tokens * 200) AS DOUBLE) / 100000.0"

  private val qualitySql =
    "WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents), " +
      "b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
      "CAST(len(w) AS BIGINT) AS n_tokens, " +
      s"$alphaRatioSql AS alpha_ratio, " +
      s"$stopRatioSql AS stop_ratio, " +
      "round(CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w), 4) AS mean_word_len " +
      "FROM d) " +
      "SELECT doc_id, n_chars, n_tokens, alpha_ratio, stop_ratio, mean_word_len, " +
      s"$qualityFromPartsSql AS quality " +
      "FROM b ORDER BY doc_id"

  // shared SQL fragments mirroring ratioIn/predLangCol (DuckDB dialect)
  private[ops] val scoreSql = Profiles
    .map { case (l, ws) =>
      val lst = ws.map(x => s"'$x'").mkString(",")
      s"round(CAST(len(list_filter(w, t -> t IN ($lst))) AS DOUBLE) / len(w), 4) AS s_$l"
    }
    .mkString(", ")

  private[ops] val predCaseSql = {
    val langs = Profiles.map(_._1)
    val cases = langs.init
      .map { l =>
        val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $ge THEN '$l'"
      }
      .mkString(" ")
    s"CASE $cases ELSE '${langs.last}' END"
  }

  private val langidSql =
    "WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents), " +
      s"b AS (SELECT doc_id, lang, $scoreSql FROM d) " +
      "SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh, " +
      s"$predCaseSql AS pred_lang, " +
      s"($predCaseSql) = lang AS label_match " +
      "FROM b ORDER BY doc_id"

  private val repetitionSql =
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents), " +
      "tc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t), " +
      "tstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, " +
      "CAST(max(c) AS BIGINT) AS top_token, CAST(count(*) AS BIGINT) AS uniq_tokens " +
      "FROM tc GROUP BY doc_id), " +
      "big AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b " +
      "FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "LATERAL (SELECT unnest(range(1, len(w))) AS i)), " +
      "bc AS (SELECT doc_id, b, count(*) AS c FROM big GROUP BY doc_id, b), " +
      "bstat AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram, " +
      "CAST(sum(c) AS BIGINT) AS n_bigrams FROM bc GROUP BY doc_id) " +
      "SELECT t.doc_id, t.n_tokens, " +
      "round(CAST(t.top_token AS DOUBLE) / t.n_tokens, 4) AS top_token_frac, " +
      "round(CAST(t.n_tokens - t.uniq_tokens AS DOUBLE) / t.n_tokens, 4) AS dup_token_frac, " +
      "round(CAST(b.top_bigram AS DOUBLE) / b.n_bigrams, 4) AS top_bigram_frac " +
      "FROM tstat t JOIN bstat b USING (doc_id) ORDER BY doc_id"

  /** The one quality floor shared by the Spark builder, the oracle SQL, and
    * CatalogSpec's reconciliation — a divergent copy would fail the hash
    * gate with no hint why.
    */
  val CurationMinQuality: Double = 0.85

  private val curationSql =
    "WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)), " +
      "d AS (SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents " +
      "WHERE doc_id IN (SELECT doc_id FROM keep)), " +
      "b AS (SELECT doc_id, lang, CAST(len(w) AS BIGINT) AS n_tokens, " +
      s"$alphaRatioSql AS alpha_ratio, " +
      s"$stopRatioSql AS stop_ratio, " +
      s"$scoreSql FROM d), " +
      "c AS (SELECT doc_id, lang, n_tokens, " +
      s"$qualityFromPartsSql AS quality, " +
      s"$predCaseSql AS pred_lang FROM b) " +
      "SELECT doc_id, n_tokens, quality, pred_lang FROM c " +
      s"WHERE quality >= $CurationMinQuality AND pred_lang = lang ORDER BY doc_id"

  /** Character-level Shannon entropy per document — the classic
    * gibberish/boilerplate signal (natural prose sits ~4.0-4.5 bits/char;
    * key-mash and repeated-char spam fall far below, base64/random blobs
    * push toward log2(alphabet)). Plan: explode to chars → per-(doc, char)
    * counts → per-doc window total → one term per distinct char →
    * DECIMAL(18,7) exact sum. Cross-engine determinism: each term
    * round(-(c/n)·log2(c/n), 7) rounds ONE transcendental product to a grid
    * ~1e6 coarser than the engines' ULP disagreement (the
    * unigram-surprisal class), and the term SUM is exact decimal — order
    * free. Entropy ≤ log2(|alphabet|) ≈ 7 bits ⇒ ≤ 7e7 grid units, exact in
    * the final double. The per-doc window is |distinct chars per doc| rows
    * — bounded by the alphabet, not the corpus.
    */
  private def textCharEntropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val p = col("c").cast("double") / col("n").cast("double")
    Tables
      .documents(s, dir)
      // Java split("") yields single chars (no empties on non-empty input);
      // the length guard also drops any empty-text row
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1)
      .groupBy("doc_id", "ch")
      .agg(graft.Qf.nrows.as("c"))
      .withColumn("n", sum("c").over(Window.partitionBy("doc_id")))
      .withColumn("t", round(-p * log2(p), 7).cast(DecimalType(18, 7)))
      .groupBy("doc_id")
      .agg(
        max("n").as("n_chars"),
        graft.Qf.nrows.as("n_distinct_chars"),
        sum("t").cast(DoubleType).as("entropy_bits"),
      )
      .orderBy("doc_id")
  }

  private val textCharEntropySql =
    "WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents WHERE length(text) > 0), " +
      "f AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2), " +
      "w AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM f), " +
      "t AS (SELECT doc_id, n, CAST(round(-(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) " +
      "* log2(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)), 7) AS DECIMAL(18,7)) AS t FROM w) " +
      "SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars, count(*) AS n_distinct_chars, " +
      "CAST(sum(t) AS DOUBLE) AS entropy_bits FROM t GROUP BY doc_id ORDER BY doc_id"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("text_quality", textQuality, Some(qualitySql)),
    QueryDef("text_char_entropy", textCharEntropy, Some(textCharEntropySql)),
    QueryDef(
      "text_token_count",
      textTokenCount,
      Some(
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens, " +
          "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens, " +
          "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS uniq_tokens " +
          "FROM documents ORDER BY doc_id"
      ),
    ),
    QueryDef("text_langid", textLangid, Some(langidSql)),
    QueryDef(
      "text_repetition",
      (s, dir) => repetition(Tables.documents(s, dir)),
      Some(repetitionSql),
    ),
    QueryDef(
      "curation_pipeline",
      (s, dir) => curationPipeline(Tables.documents(s, dir), minQuality = CurationMinQuality),
      Some(curationSql),
    ),
    QueryDef(
      "text_fingerprint",
      textFingerprint,
      Some(
        "SELECT doc_id, array_to_string((list_sort(list(DISTINCT h)))[1:4], ',') AS fp FROM " +
          "(SELECT doc_id, ('0x' || substring(md5(substr(text, i, 8)), 1, 15))::BIGINT AS h FROM " +
          "(SELECT doc_id, text, unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i FROM documents)) " +
          "GROUP BY doc_id ORDER BY doc_id"
      ),
    ),
  )
}
