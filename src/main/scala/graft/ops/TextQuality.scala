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

  private def textQuality(s: SparkSession, dir: String): DataFrame = {
    val alpha = round(
      length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") / length(col("text")),
      4,
    )
    val stop = ratioIn(Stop)
    val ai = round(alpha * 10000, 0).cast("long")
    val si = round(stop * 10000, 0).cast("long")
    val tf = least(lit(10000L), nTokens.cast("long") * 200L)
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nTokens.cast("long").as("n_tokens"),
        alpha.as("alpha_ratio"),
        stop.as("stop_ratio"),
        round((length(col("text")) - (nTokens - 1)).cast("double") / nTokens, 4).as("mean_word_len"),
        ((lit(5L) * ai + lit(3L) * (lit(10000L) - si) + lit(2L) * tf).cast("double") / 100000.0)
          .as("quality"),
      )
      .orderBy("doc_id")
  }

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
  def langid(df: DataFrame): DataFrame = {
    val scores = Profiles.map { case (l, words) => l -> ratioIn(words) }
    val byLang = scores.toMap
    val langs = Profiles.map(_._1)
    // fixed argmax priority en > de > es > fr > zh (mirrored in the oracle):
    // first language whose score >= every other wins
    val pred = langs.init.foldRight(lit(langs.last): Column) { (l, els) =>
      val sc = byLang(l)
      val beatsRest = langs.filter(_ != l).map(o => sc >= byLang(o)).reduce(_ && _)
      when(beatsRest, lit(l)).otherwise(els)
    }
    df.select(
      Seq(col("doc_id")) ++
        scores.map { case (l, c) => c.as(s"s_$l") } ++
        Seq(pred.as("pred_lang"), (pred === col("lang")).as("label_match")): _*
    ).orderBy("doc_id")
  }

  private def textLangid(s: SparkSession, dir: String): DataFrame =
    langid(Tables.documents(s, dir))

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

  private val qualitySql =
    "WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents), " +
      "b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
      "CAST(len(w) AS BIGINT) AS n_tokens, " +
      "round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text), 4) AS alpha_ratio, " +
      "round(CAST(len(list_filter(w, t -> t IN ('the','a','and','of','to'))) AS DOUBLE) / len(w), 4) AS stop_ratio, " +
      "round(CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w), 4) AS mean_word_len " +
      "FROM d) " +
      "SELECT doc_id, n_chars, n_tokens, alpha_ratio, stop_ratio, mean_word_len, " +
      "CAST(5 * CAST(round(alpha_ratio * 10000, 0) AS BIGINT) " +
      "+ 3 * (10000 - CAST(round(stop_ratio * 10000, 0) AS BIGINT)) " +
      "+ 2 * least(10000, n_tokens * 200) AS DOUBLE) / 100000.0 AS quality " +
      "FROM b ORDER BY doc_id"

  private val langidSql = {
    val score = Profiles
      .map { case (l, ws) =>
        val lst = ws.map(x => s"'$x'").mkString(",")
        s"round(CAST(len(list_filter(w, t -> t IN ($lst))) AS DOUBLE) / len(w), 4) AS s_$l"
      }
      .mkString(", ")
    val langs = Profiles.map(_._1)
    val cases = langs.init
      .map { l =>
        val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $ge THEN '$l'"
      }
      .mkString(" ")
    "WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents), " +
      s"b AS (SELECT doc_id, lang, $score FROM d) " +
      "SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh, " +
      s"CASE $cases ELSE 'zh' END AS pred_lang, " +
      s"(CASE $cases ELSE 'zh' END) = lang AS label_match " +
      "FROM b ORDER BY doc_id"
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef("text_quality", textQuality, Some(qualitySql)),
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
