package graft.ops

import graft.{QueryDef, Tables}
import graft.Qf._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 8 — tokenizer-training & language-profiling verbs: the
  * second BPE iteration (apply the winning merge, recount pairs — the step
  * that makes tokenizer training a LOOP over relational plans), the
  * language-ID confusion matrix, and per-language character-trigram
  * profiles.
  *
  * Scale doctrine, per op:
  *   - tokenizer_bpe_merge_round: everything after the first aggregation
  *     runs at VOCABULARY grain (the tokenizer_bpe_pairs rule) — the
  *     corpus scan happens once; the winning merge broadcasts as a 1-row
  *     frame; the merged re-pairing touches Σ|word| characters over
  *     |vocab| rows. A full BPE train is this plan iterated k times with
  *     the growing merge table broadcast each round.
  *   - text_lang_confusion: one corpus scan to |langs|² cells.
  *   - text_char_ngram_profile: explode → (lang, trigram) aggregate —
  *     the rank window runs over the alphabet³-bounded profile frame.
  */
object Lexicon {

  // ------------------------------------------------------------------
  // tokenizer_bpe_merge_round — BPE iteration 2 (merge + recount)
  // ------------------------------------------------------------------

  /** The second iteration of BPE tokenizer training: pick the round-1
    * winning pair (max corpus occurrences, tie-broken on the pair string),
    * merge its non-overlapping left-to-right occurrences in every vocab
    * word into one token (string `replace` scans left-to-right in both
    * engines — exactly BPE's greedy merge), then recount adjacent TOKEN
    * pairs (tokens are now chars or the merged unit, rendered as
    * `tok+tok`). The merged unit is marked by the chr(1) sentinel, which
    * cannot occur in whitespace-normalized lowercase text. Counts are
    * exact BIGINTs; ordering is (count desc, pair asc) — engine-identical.
    */
  private def tokenizerBpeMergeRound(s: SparkSession, dir: String): DataFrame = {
    val wf = Tables
      .documents(s, dir)
      .select(explode(split(Text.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w")
      .agg(nrows.as("wf"))
    val top = wf
      .select(col("wf"), explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(sum("wf").as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(1)
      .select(col("pair").as("pstar"))
    wf.join(broadcast(top)) // 1-row winning-merge frame
      .withColumn("m", expr("replace(w, pstar, chr(1))"))
      .filter(length(col("m")) >= 2) // fully-merged 2-char words pair no further
      .select(
        col("w"),
        col("wf"),
        col("pstar"),
        explode(
          expr(
            "transform(sequence(1, length(m) - 1), i -> concat(" +
              "CASE WHEN substring(m, i, 1) = chr(1) THEN pstar ELSE substring(m, i, 1) END, '+', " +
              "CASE WHEN substring(m, i + 1, 1) = chr(1) THEN pstar ELSE substring(m, i + 1, 1) END))"
          )
        ).as("pair"),
      )
      .groupBy("pstar", "pair")
      .agg(countDistinct(col("w")).as("n_words"), sum("wf").as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(20)
  }

  private val normSql = "lower(trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')))"

  // ------------------------------------------------------------------
  // tokenizer_bpe_vocab — the FULL BPE training loop (r9 verdict #6)
  // ------------------------------------------------------------------

  /** Merge count of the declared key — small enough that the DuckDB oracle
    * (an unrolled CTE chain, 3 CTEs per round) stays reviewable; the
    * LexiconSpec law runs the same loop to 50 merges against an in-memory
    * reference BPE.
    */
  private[graft] val BpeVocabMerges = 8

  /** One sentinel char per completed merge, starting at U+E001 (Private
    * Use Area) — r10 ADVICE: the original U+0101.. base collided with real
    * Latin Extended-A characters ('ā' in Pinyin/Vietnamese text), silently
    * corrupting merges on such a corpus IDENTICALLY in both engines (so
    * the hash gate could never catch it); PUA code points are guaranteed
    * unassigned to any script. Still BMP (single UTF-16 char, 3-byte
    * UTF-8), and identical to DuckDB's `chr(57344+…)` byte-for-byte, so
    * raw pair strings compare the same way in both engines (the tie-break
    * is binary `pair ASC`; PUA sorts after every ASCII char in both
    * UTF-16-code-unit and UTF-8-byte order).
    */
  private[graft] val BpeSentinelBase = 0xE000

  private def bpeSentinel(rank: Int): String = (BpeSentinelBase + rank).toChar.toString

  /** The K-round BPE tokenizer-training loop, the generalization
    * tokenizer_bpe_merge_round's scaladoc promises: each round counts
    * adjacent token pairs over the VOCABULARY-grain frame (the corpus is
    * scanned once, into word frequencies), picks the winner
    * (count desc, raw pair asc), and merges its left-to-right
    * non-overlapping occurrences in every word by replacing the 2-char
    * pair with that round's sentinel char — so tokens stay single chars
    * forever and every round is a literal `replace`, no re-tokenization.
    *
    * Scale shape: the loop runs entirely at vocab grain (|unique words|
    * rows — millions at 100 TB, never corpus rows). Per round: one
    * map-side explode + partial-aggregated pair count + a 1-ROW head()
    * (the winner is O(1) metadata, the same class of driver scalar as the
    * cluster loop's fixpoint sum — not a data collect); the merge itself
    * is a narrow map (`replace` with two literals), so rounds add NO
    * shuffle. Lineage is truncated every 8 rounds ([[Checkpoints.stable]]).
    *
    * Returns the merge table (rank, rawPair, n_occ) — rawPair in the
    * sentinel alphabet; decode via [[bpeDecode]].
    */
  private[graft] def bpeMergeTable(
      s: SparkSession,
      dir: String,
      k: Int,
  ): Seq[(Long, String, Long)] = {
    var wf = Tables
      .documents(s, dir)
      .select(explode(split(Text.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w")
      .agg(nrows.as("wf"))
      .transform(Checkpoints.stable(_, eager = false))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val top = wf
        .filter(length(col("w")) >= 2)
        .select(
          col("wf"),
          explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
        )
        .groupBy("pair")
        .agg(sum("wf").as("n_occ"))
        .orderBy(col("n_occ").desc, col("pair"))
        .limit(1)
        .take(1)
      if (top.isEmpty) exhausted = true // every word fully merged: stop early
      else {
        val pstar = top(0).getString(0)
        merges += ((rank.toLong, pstar, top(0).getLong(1)))
        wf = wf.withColumn("w", replace(col("w"), lit(pstar), lit(bpeSentinel(rank))))
        if (rank % 8 == 0) wf = Checkpoints.stable(wf, eager = false)
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Expand a sentinel-alphabet string back to corpus characters: sentinel
    * of rank j expands to merge j's pair, which may itself contain lower
    * sentinels — resolved by building expansions in rank order.
    */
  private[graft] def bpeDecode(merges: Seq[(Long, String, Long)]): Map[Char, String] = {
    val expans = scala.collection.mutable.Map.empty[Char, String]
    merges.foreach { case (rank, pstar, _) =>
      expans(bpeSentinel(rank.toInt).head) = pstar.map(c => expans.getOrElse(c, c.toString)).mkString
    }
    expans.toMap
  }

  /** Declared key: the trained merge table, decoded — (merge_rank,
    * left_tok, right_tok, merged, n_occ at selection time). This IS the
    * tokenizer artifact a BPE encoder consumes (apply merges in rank
    * order).
    */
  private def tokenizerBpeVocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = bpeMergeTable(s, dir, BpeVocabMerges)
    val expans = bpeDecode(merges)
    def dec(c: Char): String = expans.getOrElse(c, c.toString)
    merges
      .map { case (rank, pstar, n) =>
        (rank, dec(pstar(0)), dec(pstar(1)), dec(pstar(0)) + dec(pstar(1)), n)
      }
      .toDF("merge_rank", "left_tok", "right_tok", "merged", "n_occ")
      .orderBy("merge_rank")
  }

  /** Oracle: the loop unrolled as a CTE chain — round j re-pairs wf(j-1),
    * picks top_j, and replaces the winner with chr(BpeSentinelBase+j)
    * (the PUA sentinel, chr(57344+j)); decode folds
    * the raw pair through the lower rounds' winners in descending rank
    * order (each step can only introduce still-lower sentinels). The
    * coalesce(chr(2)) guard makes an exhausted round's replace a no-op,
    * and its output row is suppressed by the IS NOT NULL filter — same
    * early-stop as the Spark loop.
    */
  /** The unrolled K-round train chain (wx → wf0 → pr$j/top$j/wf$j) shared
    * by the vocab and encode oracles — ends with every round's winner
    * available as the 1-row `top$j`.
    */
  private def bpeTrainChainSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s"wx AS (SELECT unnest(string_split($normSql, ' ')) AS w FROM documents), "
    sb ++= "wf0 AS (SELECT w, CAST(count(*) AS BIGINT) AS wf FROM wx WHERE len(w) >= 2 GROUP BY 1)"
    for (j <- 1 to k) {
      sb ++= s", pr$j AS (SELECT wf, unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair " +
        s"FROM wf${j - 1} WHERE len(w) >= 2)"
      sb ++= s", top$j AS (SELECT pair AS p, CAST(sum(wf) AS BIGINT) AS n FROM pr$j GROUP BY 1 " +
        "ORDER BY n DESC, p LIMIT 1)"
      if (j < k)
        sb ++= s", wf$j AS (SELECT replace(w, coalesce((SELECT p FROM top$j), chr(2)), chr(${BpeSentinelBase + j})) AS w, wf " +
          s"FROM wf${j - 1})"
    }
    sb.toString
  }

  private val tokenizerBpeVocabSql: String = {
    val k = BpeVocabMerges
    val sb = new StringBuilder
    sb ++= "WITH " + bpeTrainChainSql(k)
    def dec(e: String, j: Int): String =
      (1 until j).reverse.foldLeft(e) { (acc, i) =>
        s"replace($acc, chr(${BpeSentinelBase + i}), (SELECT p FROM top$i))"
      }
    val rows = (1 to k).map { j =>
      s"SELECT CAST($j AS BIGINT) AS merge_rank, " +
        s"${dec(s"substr((SELECT p FROM top$j), 1, 1)", j)} AS left_tok, " +
        s"${dec(s"substr((SELECT p FROM top$j), 2, 1)", j)} AS right_tok, " +
        s"${dec(s"(SELECT p FROM top$j)", j)} AS merged, " +
        s"(SELECT n FROM top$j) AS n_occ " +
        s"WHERE (SELECT p FROM top$j) IS NOT NULL"
    }
    sb ++= " SELECT * FROM (" + rows.mkString(" UNION ALL ") + ") ORDER BY merge_rank"
    sb.toString
  }

  /** Declared key (r11): ENCODE the vocabulary with the trained tokenizer —
    * the consumer half of the BPE lifecycle (train = tokenizer_bpe_vocab,
    * encode = this, audit = tokenizer_oov_rate). Per distinct word: its
    * corpus frequency, its token count under the K-merge tokenizer, and
    * the decoded token sequence (space-joined — words were split ON spaces,
    * so the separator is unambiguous). This is the table a token-budget
    * mix actually needs: Σ wf·n_tokens is the corpus token count under the
    * REAL tokenizer, not the whitespace heuristic.
    *
    * Scale shape: training reuses [[bpeMergeTable]] (vocabulary grain,
    * corpus scanned once); the replay is K narrow `replace` maps over the
    * |vocab|-row frame (merges arrive as K driver literals — O(1) metadata
    * from the train loop, no data collect); decode is a per-char chained
    * replace in descending rank order (sentinels expand through lower
    * sentinels), all inside codegen. Nothing here touches corpus rows
    * except the one word-count aggregation. Unlike the train frame, the
    * encode frame keeps 1-char words (they encode as themselves) — a
    * tokenizer that cannot encode part of its corpus is not a tokenizer.
    */
  /** (word, we, wf): every corpus word (len ≥ 1) with its sentinel-alphabet
    * encoding under the trained [[BpeVocabMerges]]-merge tokenizer — the
    * shared replay behind tokenizer_encode and tokenizer_fertility.
    */
  private def encodedVocab(s: SparkSession, dir: String): (DataFrame, Seq[(Long, String, Long)]) = {
    val merges = bpeMergeTable(s, dir, BpeVocabMerges)
    var enc = Tables
      .documents(s, dir)
      .select(explode(split(Text.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w")
      .agg(nrows.as("wf"))
      .select(col("w").as("word"), col("w").as("we"), col("wf"))
    merges.foreach { case (rank, pstar, _) =>
      enc = enc.withColumn("we", replace(col("we"), lit(pstar), lit(bpeSentinel(rank.toInt))))
    }
    (enc, merges)
  }

  private def tokenizerEncode(s: SparkSession, dir: String): DataFrame = {
    val (enc, merges) = encodedVocab(s, dir)
    // decode: space-join we's chars (one char = one token; expansions never
    // contain spaces — words were split on them), then expand sentinels in
    // DESCENDING rank order over the whole string (an expansion may
    // introduce lower sentinels, never higher; every search target is a
    // single char, so the inserted spaces never break a match)
    val spaced = concat_ws(
      " ",
      transform(sequence(lit(1), length(col("we"))), i => substring(col("we"), i, lit(1))),
    )
    val tokens = merges.reverse.foldLeft(spaced) { case (acc, (rank, pstar, _)) =>
      replace(acc, lit(bpeSentinel(rank.toInt)), lit(pstar))
    }
    enc
      .select(
        col("word"),
        col("wf"),
        length(col("we")).cast("long").as("n_tokens"),
        tokens.as("tokens"),
      )
      .orderBy("word")
  }

  /** Oracle: the shared train chain, then the replay over a fresh
    * vocab frame that KEEPS the original word (enc0 → encK applies each
    * round's winner via its 1-row scalar subquery; an exhausted round's
    * coalesce(chr(2)) replace is a no-op), then the same per-char
    * descending-rank decode.
    */
  /** The encode-replay CTE suffix (enc0 → encK), composing onto
    * [[bpeTrainChainSql]] — shared by the encode and fertility oracles.
    */
  private def bpeEncChainSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= ", enc0 AS (SELECT w AS word, w AS we, CAST(count(*) AS BIGINT) AS wf " +
      "FROM wx WHERE len(w) >= 1 GROUP BY 1, 2)"
    for (j <- 1 to k)
      sb ++= s", enc$j AS (SELECT word, replace(we, coalesce((SELECT p FROM top$j), chr(2)), " +
        s"chr(${BpeSentinelBase + j})) AS we, wf FROM enc${j - 1})"
    sb.toString
  }

  private val tokenizerEncodeSql: String = {
    val k = BpeVocabMerges
    val sb = new StringBuilder
    sb ++= "WITH " + bpeTrainChainSql(k) + bpeEncChainSql(k)
    // lambdas cannot hold scalar subqueries, so decode the space-joined
    // char string as a whole (mirrors the Spark side exactly)
    val spaced = "array_to_string(list_transform(range(1, len(we) + 1), i -> we[i]), ' ')"
    val dec = (1 to k).reverse.foldLeft(spaced) { (acc, i) =>
      s"replace($acc, chr(${BpeSentinelBase + i}), coalesce((SELECT p FROM top$i), chr(2)))"
    }
    sb ++= s" SELECT word, wf, CAST(len(we) AS BIGINT) AS n_tokens, $dec AS tokens " +
      s"FROM enc$k ORDER BY word"
    sb.toString
  }

  /** Declared key (r11): per-language tokenizer FERTILITY — tokens per
    * word under the trained tokenizer, with the continued-word share
    * (words splitting into ≥ 2 tokens). THE standard tokenizer-equity
    * audit for a multilingual corpus: a language whose fertility is far
    * above the corpus pays more sequence length for the same text, and a
    * mix built on word counts under-budgets it. Integer-ppm arithmetic.
    *
    * Scale shape: the encoded vocabulary is |vocab| rows (the
    * [[encodedVocab]] replay); the corpus contributes one token-grain
    * explode joined to that vocabulary-bounded frame (AQE broadcasts it
    * while it fits), partial-aggregated to |langs| rows map-side.
    */
  private def tokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val (enc, _) = encodedVocab(s, dir)
    val ev = enc.select(col("word").as("w"), length(col("we")).cast("long").as("n_tokens"))
    Tables
      .documents(s, dir)
      .select(col("lang"), explode(split(Text.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .join(ev, "w")
      .groupBy("lang")
      .agg(
        nrows.as("n_words"),
        sum("n_tokens").as("n_tokens"),
        sum(when(col("n_tokens") > 1, 1L).otherwise(0L)).as("n_continued"),
      )
      .select(
        col("lang"),
        col("n_words"),
        col("n_tokens"),
        expr("n_tokens * 1000000 div n_words").as("fertility_ppm"),
        expr("n_continued * 1000000 div n_words").as("continued_ppm"),
      )
      .orderBy("lang")
  }

  private val tokenizerFertilitySql: String = {
    val k = BpeVocabMerges
    "WITH " + bpeTrainChainSql(k) + bpeEncChainSql(k) +
      s", ev AS (SELECT word AS w, CAST(len(we) AS BIGINT) AS n_tokens FROM enc$k), " +
      s"tw AS (SELECT lang, unnest(string_split($normSql, ' ')) AS w FROM documents), " +
      "j AS (SELECT lang, n_tokens FROM tw JOIN ev USING (w) WHERE len(w) >= 1) " +
      "SELECT lang, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(n_tokens) AS BIGINT) AS n_tokens, " +
      "CAST(sum(n_tokens) * 1000000 // count(*) AS BIGINT) AS fertility_ppm, " +
      "CAST(sum(CASE WHEN n_tokens > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS continued_ppm " +
      "FROM j GROUP BY lang ORDER BY lang"
  }

  private val tokenizerBpeMergeRoundSql =
    s"WITH wx AS (SELECT unnest(string_split($normSql, ' ')) AS w FROM documents), " +
      "wf AS (SELECT w, CAST(count(*) AS BIGINT) AS wf FROM wx WHERE len(w) >= 2 GROUP BY 1), " +
      "pr AS (SELECT w, wf, unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair FROM wf), " +
      "top AS (SELECT pair AS pstar FROM (SELECT pair, sum(wf) AS n_occ FROM pr GROUP BY 1) " +
      "ORDER BY n_occ DESC, pair LIMIT 1), " +
      "m AS (SELECT w, wf, pstar, replace(w, pstar, chr(1)) AS m FROM wf, top), " +
      "p2 AS (SELECT w, wf, pstar, unnest(list_transform(range(1, len(m)), i -> " +
      "(CASE WHEN m[i] = chr(1) THEN pstar ELSE m[i] END) || '+' || " +
      "(CASE WHEN m[i+1] = chr(1) THEN pstar ELSE m[i+1] END))) AS pair " +
      "FROM m WHERE len(m) >= 2) " +
      "SELECT pstar, pair, CAST(count(DISTINCT w) AS BIGINT) AS n_words, CAST(sum(wf) AS BIGINT) AS n_occ " +
      "FROM p2 GROUP BY 1, 2 ORDER BY n_occ DESC, pair LIMIT 20"

  // ------------------------------------------------------------------
  // text_lang_confusion — language-ID confusion matrix
  // ------------------------------------------------------------------

  /** Confusion matrix of the text_langid classifier against the labeled
    * lang column: per (true, predicted) cell, count and integer-ppm recall
    * share of the true class. Reuses the SAME prediction column (and SQL
    * fragments) as text_langid, so the evaluation can never drift from the
    * classifier it evaluates (the ml_eval_confusion rule).
    */
  private def textLangConfusion(s: SparkSession, dir: String): DataFrame = {
    val m = Tables
      .documents(s, dir)
      .select(col("lang").as("true_lang"), TextQuality.predLangCol.as("pred_lang"))
      .groupBy("true_lang", "pred_lang")
      .agg(nrows.as("n"))
    val tot = m.groupBy("true_lang").agg(sum("n").as("n_true"))
    m.join(tot, Seq("true_lang"))
      .select(
        col("true_lang"),
        col("pred_lang"),
        col("n"),
        col("n_true"),
        expr("n * 1000000 div n_true").as("recall_ppm"),
      )
      .orderBy("true_lang", "pred_lang")
  }

  private val textLangConfusionSql =
    "WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents), " +
      s"b AS (SELECT lang, ${TextQuality.scoreSql} FROM d), " +
      s"p AS (SELECT lang AS true_lang, ${TextQuality.predCaseSql} AS pred_lang FROM b), " +
      "m AS (SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2), " +
      "t AS (SELECT true_lang, CAST(sum(n) AS BIGINT) AS n_true FROM m GROUP BY 1) " +
      "SELECT m.true_lang AS true_lang, pred_lang, n, n_true, " +
      "CAST(n * 1000000 // n_true AS BIGINT) AS recall_ppm " +
      "FROM m JOIN t ON m.true_lang = t.true_lang ORDER BY true_lang, pred_lang"

  // ------------------------------------------------------------------
  // text_char_ngram_profile — per-language character trigram profile
  // ------------------------------------------------------------------

  /** Top-5 within-word character trigrams per language label — the
    * classic character-n-gram language fingerprint (what a real langid
    * model trains on; the profile table is the model). Trigrams explode at
    * token grain map-side; the rank window runs over the alphabet³-bounded
    * (lang, trigram) profile frame, never doc grain.
    */
  private def textCharNgramProfile(s: SparkSession, dir: String): DataFrame = {
    val tri = Tables
      .documents(s, dir)
      .select(col("lang"), explode(split(Text.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 3)
      .select(
        col("lang"),
        explode(expr("transform(sequence(1, length(w) - 2), i -> substring(w, i, 3))")).as("trigram"),
      )
      .groupBy("lang", "trigram")
      .agg(nrows.as("n_occ"))
    val rankW = Window.partitionBy("lang").orderBy(col("n_occ").desc, col("trigram"))
    tri
      .withColumn("rnk", asLong(row_number().over(rankW)))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("rnk"), col("trigram"), col("n_occ"))
      .orderBy("lang", "rnk")
  }

  private val textCharNgramProfileSql =
    s"WITH wx AS (SELECT lang, unnest(string_split($normSql, ' ')) AS w FROM documents), " +
      "tr AS (SELECT lang, unnest(list_transform(range(1, len(w) - 1), i -> substr(w, i, 3))) AS trigram " +
      "FROM wx WHERE len(w) >= 3), " +
      "c AS (SELECT lang, trigram, CAST(count(*) AS BIGINT) AS n_occ FROM tr GROUP BY 1, 2), " +
      "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY n_occ DESC, trigram) AS BIGINT) AS rnk FROM c) " +
      "SELECT lang, rnk, trigram, n_occ FROM r WHERE rnk <= 5 ORDER BY lang, rnk"

  val entries: Seq[QueryDef] = Seq(
    QueryDef("tokenizer_bpe_merge_round", tokenizerBpeMergeRound, Some(tokenizerBpeMergeRoundSql)),
    QueryDef("tokenizer_bpe_vocab", tokenizerBpeVocab, Some(tokenizerBpeVocabSql)),
    QueryDef("tokenizer_encode", tokenizerEncode, Some(tokenizerEncodeSql)),
    QueryDef("tokenizer_fertility", tokenizerFertility, Some(tokenizerFertilitySql)),
    QueryDef("text_lang_confusion", textLangConfusion, Some(textLangConfusionSql)),
    QueryDef("text_char_ngram_profile", textCharNgramProfile, Some(textCharNgramProfileSql)),
  )
}
