package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the §2.14 web-corpus prep verbs — laws that hold
  * on ANY corpus, beyond the driver's hash gate.
  */
class CorpusPrepSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("dedup_url_norm: partition law and canonical-form syntax") {
    val rows = run("dedup_url_norm").collect()
    val corpus = Tables.documents(spark, sfDir).count()
    // every doc lands in exactly one canonical group
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
    // canonical form: lowercase authority, no www, no default port, no
    // query/fragment, no trailing slash
    rows.foreach { r =>
      val u = r.getAs[String]("canonical_url")
      assert(u.startsWith("http://") || u.startsWith("https://"), u)
      val authority = u.split("/", -1)(2)
      assert(authority == authority.toLowerCase, s"authority case: $u")
      assert(!authority.startsWith("www."), s"www survived: $u")
      assert(!u.contains(":80") && !u.contains(":443"), s"default port survived: $u")
      assert(!u.contains("?") && !u.contains("#"), s"query/fragment survived: $u")
      assert(!u.endsWith("/"), s"trailing slash survived: $u")
    }
    // the synthesizer's collision period is lcm(5,24)=120 doc_ids and the
    // fixture has 500, so dedup must actually merge here
    assert(rows.exists(_.getAs[Long]("n_docs") > 1), "no URL group merged anything")
  }

  test("filter_quality_rules: metric ranges, rule consistency, both branches hit") {
    val rows = run("filter_quality_rules").collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val nw = r.getAs[Long]("n_words")
      val dr = r.getAs[Long]("distinct_ratio")
      val tf = r.getAs[Long]("top_word_frac")
      assert(nw > 0)
      assert(dr >= 0 && dr <= 1000, s"distinct_ratio out of per-mille range: $dr")
      // the top word appears at least ceil(n_words/n_distinct) times, and a
      // doc of all-distinct words has top_word_frac = 1000/n_words
      assert(tf >= 1000 / nw, s"top_word_frac below floor: $tf for $nw words")
      val wl = r.getAs[Long]("mean_wlen_x10")
      assert(wl > 0, s"mean word length must be positive: $wl")
      assert(
        r.getAs[Boolean]("keep") ==
          (nw >= 30 && dr >= 400 && tf <= 120 && wl >= 30 && wl <= 100),
        s"keep flag inconsistent with its own metrics: $r",
      )
    }
    assert(rows.exists(_.getAs[Boolean]("keep")), "no doc kept")
    assert(rows.exists(!_.getAs[Boolean]("keep")), "no doc dropped")
  }

  test("filter_domain_blocklist: survivors' hosts are clean and the filter actually drops") {
    val rows = run("filter_domain_blocklist").collect()
    val corpus = Tables.documents(spark, sfDir).count()
    assert(rows.length < corpus, "blocklist must drop some docs")
    assert(rows.nonEmpty, "blocklist must not drop everything")
    val blocked = ops.CorpusPrep.BlockedHosts.toSet
    rows.foreach { r =>
      val h = r.getAs[String]("host")
      assert(!blocked.contains(h), s"blocked host survived: $h")
      assert(h.matches("site[0-9]\\.example\\.com"), s"malformed host: $h")
    }
  }

  test("filter_term_blocklist: survivors contain no blocked term, filter actually drops, plan shuffles nothing") {
    val df = SparkEntry.queries("filter_term_blocklist")(spark, sfDir)
    val rows = df.collect()
    val corpus = Tables.documents(spark, sfDir).count()
    assert(rows.nonEmpty && rows.length < corpus, s"${rows.length} of $corpus survived")
    // cross-check against an independent formulation (explode + anti join)
    val independent = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin(ops.CorpusPrep.BlockedTerms: _*))
      .select("doc_id")
      .distinct()
      .count()
    assert(rows.length == corpus - independent, "overlap filter disagrees with explode formulation")
    // map-side only: the declared sort is the ONLY exchange in the plan
    // (count real operators, not toString lines — AQE stage wrappers print
    // an extra "Exchange" mention per shuffle)
    df.count()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other                                                            => other
    }
    val exchanges = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.length <= 1, s"term filter must not shuffle data (found ${exchanges.length})")
  }

  test("dedup_incremental: status laws per content-hash group, all branches hit") {
    val rows = run("dedup_incremental").collect()
    val statuses = rows.map(_.getAs[String]("status")).toSet
    assert(statuses == Set("unique", "dup_of_seen", "dup_in_batch"), s"missing branch: $statuses")
    rows.groupBy(_.getAs[String]("content_md5")).foreach { case (k, grp) =>
      val st = grp.map(_.getAs[String]("status")).toSet
      if (st.contains("dup_of_seen"))
        // a hash known to the manifest marks EVERY batch occurrence
        assert(st == Set("dup_of_seen"), s"$k mixes seen and in-batch statuses: $st")
      else {
        // first-wins: exactly one unique, and it has the smallest batch_id
        val uniques = grp.filter(_.getAs[String]("status") == "unique")
        assert(uniques.length == 1, s"$k has ${uniques.length} uniques")
        assert(
          uniques.head.getAs[Long]("batch_id") == grp.map(_.getAs[Long]("batch_id")).min,
          s"$k: unique is not the first occurrence",
        )
      }
    }
  }

  test("dedup_lines: kept total ≡ distinct-line count (independent rebuild), dedup fires") {
    val out = run("dedup_lines").collect()
    // independent line reconstruction: token explode + ordered regroup —
    // shares only the LineTokens constant with the op, not its hashing path
    val lines = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("idx", "tok")))
      .groupBy(col("doc_id"), floor(col("idx") / ops.CorpusPrep.LineTokens).as("line_no"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("idx"), col("tok")))),
            x => x.getField("tok"),
          ),
          " ",
        ).as("line")
      )
    val totalLines = lines.count()
    val distinctLines = lines.select("line").distinct().count()
    assert(out.map(_.getAs[Long]("n_lines")).sum == totalLines, "line partition law broken")
    // first-wins keeps every DISTINCT line exactly once corpus-wide
    assert(out.map(_.getAs[Long]("n_kept")).sum == distinctLines, "kept ≠ distinct lines")
    assert(out.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_lines")),
      "no duplicate line removed — fixture no longer exercises the dedup")
    out.foreach { r =>
      assert(r.getAs[String]("kept_sig").matches("[0-9a-f]{32}"), "kept_sig not an md5 hex")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_lines"))
    }
  }

  test("filter_boilerplate_lines: frequency gate ≡ independent rebuild, removes ALL occurrences") {
    val out = run("filter_boilerplate_lines").collect()
    // independent reformulation on line TEXT (not the op's hash path):
    // per-line distinct-doc frequency, then per-doc count of sub-threshold lines
    val lines = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("idx", "tok")))
      .groupBy(col("doc_id"), floor(col("idx") / ops.CorpusPrep.LineTokens).as("line_no"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("idx"), col("tok")))),
            x => x.getField("tok"),
          ),
          " ",
        ).as("line")
      )
    val freq = lines.groupBy("line").agg(countDistinct("doc_id").as("nd"))
    val expected = lines
      .join(freq, "line")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("nd") < ops.CorpusPrep.BoilerplateDocs, 1L).otherwise(0L)).as("n_kept"),
      )
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept")))
      .toMap
    out.foreach { r =>
      val (nl, nk) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_lines") == nl, s"n_lines mismatch for $r")
      assert(r.getAs[Long]("n_kept") == nk, s"n_kept mismatch for $r")
      assert(r.getAs[String]("kept_sig").matches("[0-9a-f]{32}"))
    }
    // unlike dedup_lines' first-wins, a frequent line survives NOWHERE:
    // total kept == instances of lines that occur in exactly one distinct doc
    val singleDocInstances = lines
      .join(freq.filter(col("nd") < ops.CorpusPrep.BoilerplateDocs), "line")
      .count()
    assert(out.map(_.getAs[Long]("n_kept")).sum == singleDocInstances)
    assert(out.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_lines")),
      "no boilerplate line removed — fixture no longer exercises the gate")
  }

  test("classify_quality: plain-Scala score recompute, label consistency, both labels hit") {
    val out = run("classify_quality").collect()
    val docs = Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(out.length == docs.size)
    def weight(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % ops.CorpusPrep.HashBuckets % 1001L - 500L
    }
    out.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Long]("n_tok") == toks.length.toLong)
      val score = toks.map(weight).sum
      assert(r.getAs[Long]("score") == score, s"score mismatch for doc ${r.get(0)}")
      assert(r.getAs[Boolean]("label") == (score > 0L))
    }
    assert(out.exists(_.getAs[Boolean]("label")), "no positive docs")
    assert(out.exists(!_.getAs[Boolean]("label")), "no negative docs")
  }

  test("vocab_coverage: rank/monotonicity laws and exact ppm recompute") {
    val out = run("vocab_coverage").collect() // ordered by rank
    val toks = Tables
      .documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
    val vocabSize = toks.select("token").distinct().count()
    val total = toks.count()
    assert(out.length == math.min(ops.CorpusPrep.VocabTopK.toLong, vocabSize))
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to out.length).toSeq, "ranks not contiguous")
    val occ = out.map(_.getAs[Long]("n_occ"))
    assert(occ.zip(occ.tail).forall { case (a, b) => a >= b }, "n_occ not non-increasing")
    // exact integer recompute of the cumulative ppm curve
    var cum = 0L
    out.foreach { r =>
      cum += r.getAs[Long]("n_occ")
      assert(r.getAs[Long]("cum_ppm") == cum * 1000000L / total,
        s"cum_ppm drifted at rank ${r.getAs[Long]("rank")}")
    }
    val ppm = out.map(_.getAs[Long]("cum_ppm"))
    assert(ppm.last <= 1000000L && ppm.zip(ppm.tail).forall { case (a, b) => a < b })
  }

  test("text_html_strip: tag counts follow the planted markup and the clean text round-trips") {
    val out = SparkEntry.queries("text_html_strip")(spark, sfDir).collect()
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = 10L + (if (id % 3 == 0) 2L else 0L) + (if (id % 5 == 0) 2L else 0L)
      assert(r.getAs[Long]("n_tags") == expected, s"doc $id tag count")
    }
    // the cleaned text must be exactly 'd{id} <collapsed text>' (+ the
    // decoded entity paragraph for every 5th doc); script bodies never
    // survive. Asserted via md5 equality computed from the raw corpus.
    val expectedMd5 = Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        md5(
          concat(
            lit("d"),
            col("doc_id").cast("string"),
            lit(" "),
            trim(regexp_replace(col("text"), "\\s+", " ")),
            when(col("doc_id") % 5 === 0, lit(" x & y <z> w v")).otherwise(lit("")),
          )
        ).as("want"),
      )
    val got = SparkEntry.queries("text_html_strip")(spark, sfDir).select("doc_id", "clean_md5")
    assert(got.join(expectedMd5, "doc_id").filter(col("clean_md5") =!= col("want")).count() == 0)
  }

  test("filter_site_quality: drops exactly the bottom-ranked site, keeps the rest intact") {
    val out = run("filter_site_quality").collect()
    // recompute the site rollup from the raw corpus
    val scored = Tables
      .documents(spark, sfDir)
      .filter(length(col("text")) > 0)
      .select(
        col("doc_id"),
        (col("doc_id") % 5).as("site"),
        expr("(1000 * length(regexp_replace(text, '[^a-z]', ''))) div length(text)").as("q"),
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val siteQ = scored.groupBy(_._2).map { case (s0, ds) => s0 -> ds.map(_._3).sum / ds.length }
    val worst = siteQ.toSeq.minBy { case (s0, q) => (q, s"site$s0.example.com") }._1
    val keptHosts = out.map(_.getAs[String]("host")).distinct.sorted
    assert(!keptHosts.contains(s"site$worst.example.com"), "worst site must be dropped")
    assert(keptHosts.length == siteQ.size - 1, "exactly one site dropped")
    // doc set = all docs of the kept sites
    val expectIds = scored.collect { case (id, s0, _) if s0 != worst => id }.toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expectIds)
    // per-row site mean matches the rollup
    out.foreach { r =>
      val s0 = r.getAs[String]("host").stripPrefix("site").takeWhile(_.isDigit).toLong
      assert(r.getAs[Long]("site_q_milli") == siteQ(s0), s"site $s0 mean")
    }
  }
}
