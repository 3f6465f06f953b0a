package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the §2.13 mix/privacy/quantization verbs — the
  * laws that hold on ANY corpus, beyond the driver's hash gate.
  */
class MixesSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("mix_epoch_plan: shares sum to ~1e6 ppm, epoch/deficit algebra, want == token-budget fill") {
    val rows = SparkEntry.queries("mix_epoch_plan")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ppmSum = rows.map(_.getLong(3)).sum
    assert(ppmSum > 1000000L - rows.length && ppmSum <= 1000000L, s"ppm sum $ppmSum")
    rows.foreach { r =>
      val (stock, want, epochs, served, deficit) =
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(epochs == math.min(4L, (want + stock - 1) / stock), "epoch ceil")
      assert(served == math.min(want, 4 * stock), "served")
      assert(deficit == want - served && deficit >= 0, "deficit")
      assert(deficit == 0 || epochs == 4L, "deficit only at the epoch cap")
    }
    // the plan's want_tokens IS sample_token_budget's per-lang budget —
    // the two keys must agree on the number they share
    val budgets = SparkEntry
      .queries("sample_token_budget")(spark, sfDir)
      .select("lang", "budget_tokens")
      .distinct()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    rows.foreach { r =>
      budgets.get(r.getString(0)).foreach { b =>
        assert(r.getLong(4) == b, s"want != budget for ${r.getString(0)}")
      }
    }
  }

  test("sample_importance_dsir: exact quota, LM discrimination, Gumbel-resample enrichment") {
    val rows = SparkEntry.queries("sample_importance_dsir")(spark, sfDir).collect()
    val n = rows.length
    // (a) Gumbel-top-k keeps EXACTLY the top quarter — a resample quota,
    // not a threshold that drifts with the score distribution
    assert(rows.count(_.getBoolean(5)) == n / 4, "kept quota != floor(n/4)")
    // (b) the log-likelihood-ratio score must actually discriminate the
    // target domain: mean λ of target-lang docs above the rest
    val (en, rest) = rows.partition(_.getString(1) == "en")
    val enMean = en.map(_.getDouble(2)).sum / en.length
    val restMean = rest.map(_.getDouble(2)).sum / rest.length
    info(s"mean λ: en = $enMean, non-en = $restMean")
    assert(enMean > restMean + 0.05, "target LM ratio does not discriminate")
    // (c) the kept set is enriched toward the target domain vs the corpus
    // (pure-noise selection would match the corpus share in expectation)
    val kept = rows.filter(_.getBoolean(5))
    val keptEn = kept.count(_.getString(1) == "en").toDouble / kept.length
    val corpusEn = en.length.toDouble / n
    info(s"en share: corpus = $corpusEn, kept = $keptEn")
    assert(keptEn > corpusEn, "importance resample did not enrich the target domain")
    // (d) score decomposition holds row-wise: score = λ + gumbel on the
    // 1e-6 decimal grid (exact addition — no drift between the columns)
    rows.foreach { r =>
      val diff = math.abs(r.getDouble(4) - (r.getDouble(2) + r.getDouble(3)))
      assert(diff < 1e-9, s"score != lam + gumbel for doc ${r.getLong(0)}")
    }
  }

  test("sample_temperature: weights sum to ~1 and target_docs to ~1000; sqrt flattens the mix") {
    val rows = run("sample_temperature").collect()
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    val tsum = rows.map(_.getAs[Long]("target_docs")).sum
    assert(math.abs(tsum - 1000L) <= rows.length, s"targets sum to $tsum")
    // temperature flattening: the sampled share of the largest language is
    // strictly below its natural share, the smallest strictly above
    val n = rows.map(_.getAs[Long]("n_docs").toDouble)
    val tot = n.sum
    val big = rows.maxBy(_.getAs[Long]("n_docs"))
    val small = rows.minBy(_.getAs[Long]("n_docs"))
    assert(big.getAs[Double]("weight") < big.getAs[Long]("n_docs") / tot)
    assert(small.getAs[Double]("weight") > small.getAs[Long]("n_docs") / tot)
  }

  test("text_pii_redact: counts follow the planted density and redaction is complete") {
    val rows = run("text_pii_redact").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") == id % 3, s"doc $id email count")
      assert(r.getAs[Long]("n_phones") == id % 2, s"doc $id phone count")
    }
    // completeness: re-running the redactor over already-redacted text must
    // find zero PII (the regexes cannot match their own replacement tokens)
    val synth = expr(
      "concat(text, repeat(concat(' u', cast(doc_id AS STRING), '@mail.com'), cast(doc_id % 3 AS INT)))"
    )
    val redacted = Tables
      .documents(spark, sfDir)
      .select(regexp_replace(synth, "[a-z0-9]+@[a-z]+\\.[a-z]+", "<EMAIL>").as("t"))
      .select(regexp_count(col("t"), lit("[a-z0-9]+@[a-z]+\\.[a-z]+")).as("left"))
      .agg(sum("left"))
      .first()
      .getLong(0)
    assert(redacted == 0L, s"$redacted emails survived redaction")
  }

  test("embed_quantize_int8: scale bounds, saturation, and reconstruction error law") {
    // laws checked on the raw vectors, independent of the declared flattening
    val e = Tables
      .embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qs", ops.Mixes.quantizeInt8(col("v"), col("scale")))
    val bad = e
      .select(
        // every quantized value within int8 symmetric range
        size(filter(col("qs"), q => abs(q) > 127)).as("oob"),
        // max |x - q*scale/127| <= scale/254 + eps (half a quantization step)
        aggregate(
          zip_with(col("v"), col("qs"), (x, q) => abs(x - q * col("scale") / 127.0)),
          lit(0.0),
          (a, d) => greatest(a, d),
        ).as("maxerr"),
        col("scale"),
      )
      .filter(col("oob") > 0 || col("maxerr") > col("scale") / 254.0 + 1e-12)
      .count()
    assert(bad == 0L, s"$bad vectors violate quantization laws")
    // the max-|x| element always saturates, so n_sat >= 1 for nonzero vectors
    val out = run("embed_quantize_int8")
    assert(out.filter(col("n_sat") < 1).count() == 0L)
  }

  test("embed_quantize_int8: an all-zero vector quantizes to zeros instead of throwing (ANSI NaN cast)") {
    import spark.implicits._
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val qs = z
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .select(ops.Mixes.quantizeInt8(col("v"), col("scale")).as("qs"))
      .first()
      .getSeq[Long](0)
    assert(qs == Seq(0L, 0L, 0L))
  }

  test("sample_weighted: weight-proportional inclusion, top-k plan, shard-merge law") {
    val docs = Tables.documents(spark, sfDir)
    val out = run("sample_weighted").collect()
    assert(out.length == 20)
    // clocks nonnegative and rn matches the (clock, doc_id) order
    assert(out.sortBy(r => (r.getAs[Double]("clock"), r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("rn")).toSeq == (1L to 20L))
    // efficacy: exponential clocks favor heavy docs — the sample's mean
    // weight must exceed the corpus mean (deterministic for the fixture)
    val corpusMean = docs.agg(avg(col("n_chars"))).first().getDouble(0)
    val sampleMean = out.map(_.getAs[Long]("n_chars").toDouble).sum / out.length
    assert(sampleMean > corpusMean, s"sample $sampleMean <= corpus $corpusMean")
    // plan: orderBy+limit must fuse to TakeOrderedAndProject (per-partition
    // bottom-k, merge of k-sized heaps — the 100 TB shape)
    val p = SparkEntry.queries("sample_weighted")(spark, sfDir).queryExecution.executedPlan
    assert(p.toString.contains("TakeOrderedAndProject"), p.toString.take(800))
    // mergeability: top-k over the union == top-k of per-shard top-ks
    val clock = {
      val raw = conv(substring(md5(concat(lit("es#"), col("doc_id").cast("string"))), 1, 13), 16, 10)
        .cast("long")
      round((log((raw + lit(1L)) / lit(4503599627370496.0)) * -1) / greatest(col("n_chars"), lit(1)), 9)
    }
    val clocked = docs.select(col("doc_id"), clock.as("clock"))
    val whole = clocked.orderBy(col("clock"), col("doc_id")).limit(20).collect().map(_.getLong(0)).toSeq
    val shardA = clocked.filter(col("doc_id") % 2 === 0).orderBy(col("clock"), col("doc_id")).limit(20)
    val shardB = clocked.filter(col("doc_id") % 2 =!= 0).orderBy(col("clock"), col("doc_id")).limit(20)
    val merged =
      shardA.unionByName(shardB).orderBy(col("clock"), col("doc_id")).limit(20).collect().map(_.getLong(0)).toSeq
    assert(merged == whole, "bottom-k sketch must merge losslessly across shards")
  }

  test("sample_reservoir_group: per-stratum size law and shard-merge law") {
    val out = run("sample_reservoir_group").collect()
    val langSizes = Tables
      .documents(spark, sfDir)
      .groupBy("lang")
      .count()
      .collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count"))
      .toMap
    val byLang = out.groupBy(_.getAs[String]("lang"))
    assert(byLang.keySet == langSizes.keySet)
    byLang.foreach { case (l, rows) =>
      assert(rows.length == math.min(4L, langSizes(l)), s"lang $l sample size")
      assert(rows.map(_.getAs[Long]("rn")).sorted.toSeq == (1L to rows.length))
    }
    // shard-merge: per-shard bottom-4-per-lang, unioned and re-ranked, must
    // reproduce the whole-corpus sample exactly
    val docs = Tables.documents(spark, sfDir)
    val prio = conv(substring(md5(concat(lit("rg#"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(col("prio"), col("doc_id"))
    def bottom4(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang"), col("doc_id"), prio.as("prio"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 4)
        .drop("rn")
    val whole2 = bottom4(docs).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val merged2 = bottom4(docs.filter(col("doc_id") % 2 === 0))
      .unionByName(bottom4(docs.filter(col("doc_id") % 2 =!= 0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSet
    assert(merged2 == whole2, "per-stratum bottom-k must merge losslessly across shards")
  }

  test("sample_epoch_shuffle: each epoch is a dense permutation, epochs genuinely differ") {
    val out = SparkEntry.queries("sample_epoch_shuffle")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    val byEpoch = out.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (e, rows) =>
      // positions are exactly 1..n (a permutation of the corpus)
      assert(rows.map(_.getAs[Long]("position")).sorted.toSeq == (1L to nDocs),
        s"epoch $e positions are not dense 1..$nDocs")
      assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == nDocs.toInt)
    }
    // different epochs visit docs in different orders (the whole point);
    // identical orders would mean the epoch salt is not reaching the hash
    def order(e: Long) =
      byEpoch(e).sortBy(_.getAs[Long]("position")).map(_.getAs[Long]("doc_id")).toSeq
    assert(order(0L) != order(1L) && order(1L) != order(2L))
    // and a doc's position is shard-computable: re-deriving the rank of one
    // doc from the hash alone matches the declared position
    val e1 = byEpoch(1L)
    val target = e1.minBy(_.getAs[Long]("position"))
    val tOrd = (target.getAs[Long]("prio"), target.getAs[Long]("doc_id"))
    assert(
      e1.count { r =>
        val o = (r.getAs[Long]("prio"), r.getAs[Long]("doc_id"))
        Ordering[(Long, Long)].lt(o, tOrd)
      } == 0,
      "position-1 doc must have the minimal (prio, doc_id)")
  }

  test("sample_mix_exact: quotas met exactly and survivors are the hash-minimal docs per lang") {
    val out = SparkEntry.queries("sample_mix_exact")(spark, sfDir).collect()
    val docs = Tables
      .documents(spark, sfDir)
      .select("doc_id", "lang")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    def h52(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mix#$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    // recompute the integer-arithmetic quotas
    val byLang = docs.groupBy(_._2)
    val s6 = byLang.map { case (l, d) =>
      l -> BigDecimal(math.sqrt(d.length.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val tot6 = s6.values.sum
    val budget = docs.length.toLong / 2
    val targets = s6.map { case (l, v) =>
      val w = BigDecimal(v.toDouble / tot6.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      val w4 = BigDecimal(w * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      l -> w4 * budget / 10000
    }
    val kept = out.groupBy(_.getAs[String]("lang"))
    targets.foreach { case (l, t) =>
      val want = math.min(t, byLang(l).length.toLong)
      assert(kept.get(l).map(_.length.toLong).getOrElse(0L) == want, s"quota for $l")
    }
    // survivors are exactly the target_docs hash-minimal docs of each lang,
    // with rk = their 1-based position in (h, doc_id) order
    kept.foreach { case (l, rows) =>
      val wantIds = byLang(l).map(_._1).sortBy(id => (h52(id), id)).take(rows.length)
      val gotByRank = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("doc_id"))
      assert(gotByRank.toSeq == wantIds.toSeq, s"survivor set / rank order differs for $l")
    }
    assert(out.length < docs.length, "the half-corpus budget must actually subsample")
  }

  test("sample_negative_pairs: 4 negatives per doc, never self, a permutation per draw") {
    val out = SparkEntry.queries("sample_negative_pairs")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(out.length == nDocs * 4)
    // ring successor is never the doc itself (bucket sizes >= 2 here)
    assert(out.count(r => r.getAs[Long]("partner") == r.getAs[Long]("doc_id")) == 0)
    // within each draw, partners form a PERMUTATION of the corpus: every
    // doc serves as a negative exactly once (no popular-doc bias)
    out.groupBy(_.getAs[Long]("j")).foreach { case (j, rows) =>
      assert(rows.length == nDocs, s"draw $j row count")
      assert(rows.map(_.getAs[Long]("partner")).distinct.length == nDocs.toInt,
        s"draw $j: partners are not a permutation")
    }
    // draws genuinely differ (the per-draw hash salt reaches the ring)
    def partnersOf(j: Long) =
      out.filter(_.getAs[Long]("j") == j).map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("partner")).toMap
    assert(partnersOf(0L) != partnersOf(1L))
  }

  test("sample_group_split: duplicate clusters never straddle splits; assignment is total") {
    val out = SparkEntry.queries("sample_group_split")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(out.length.toLong == nDocs, "every doc is assigned")
    val splits = Set("train", "valid", "test")
    assert(out.forall(r => splits(r.getAs[String]("split"))))
    // the leakage-safety law: one split per representative group
    out.groupBy(_.getAs[Long]("rep_id")).foreach { case (rep, rows) =>
      assert(rows.map(_.getAs[String]("split")).distinct.length == 1, s"cluster $rep straddles splits")
      assert(rows.forall(_.getAs[Long]("doc_id") >= rep), s"cluster $rep: rep is not the min doc")
      assert(rows.exists(_.getAs[Long]("doc_id") == rep), s"cluster $rep: rep not a member")
    }
    // hash split lands near 80/10/10 at the CLUSTER grain (binomial noise)
    val groups = out.groupBy(_.getAs[Long]("rep_id")).map { case (_, rs) => rs.head.getAs[String]("split") }.toSeq
    val trainFrac = groups.count(_ == "train").toDouble / groups.length
    assert(trainFrac > 0.65 && trainFrac < 0.95, s"train fraction $trainFrac")
    assert(groups.exists(_ != "train"), "eval side must be non-empty")
  }

  test("sample_token_budget: selection equals the in-memory greedy fill; budgets are the temperature split") {
    import org.apache.spark.sql.functions.{col, size, split}
    val out = SparkEntry.queries("sample_token_budget")(spark, sfDir).collect()
    // in-memory reference: per-lang docs in (md5-priority, doc_id) order,
    // keep while the doc STARTS inside the lang's token budget
    val docs = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def pri(docId: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s"tokbudget#$docId".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(13),
        16,
      )
    }
    val total = docs.map(_._3).sum
    val s6i = docs
      .groupBy(_._2)
      .map { case (l, ds) =>
        l -> (BigDecimal(math.sqrt(ds.length.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLong
      }
    val ssum = s6i.values.sum
    val budget = s6i.map { case (l, v) => l -> (total / 3) * (v * 1000000L / ssum) / 1000000L }
    val expected = docs
      .groupBy(_._2)
      .toSeq
      .flatMap { case (l, ds) =>
        var cum = 0L
        ds.sortBy(d => (pri(d._1), d._1)).toSeq.flatMap { d =>
          val keep = cum < budget(l)
          cum += d._3
          if (keep) Some((d._1, l, d._3, cum, budget(l))) else None
        }
      }
      .toSet
    val got = out.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("budget_tokens"))).toSet
    assert(got == expected, s"selection mismatch: extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    // the fill property: per lang, either the whole stock is kept (budget
    // exceeds it) or the kept tokens reach the budget line
    out.groupBy(_.getAs[String]("lang")).foreach { case (l, rows) =>
      val keptTokens = rows.map(_.getAs[Long]("n_tokens")).sum
      val stock = docs.filter(_._2 == l).map(_._3).sum
      assert(
        keptTokens >= budget(l) || rows.length == docs.count(_._2 == l),
        s"lang $l underfilled: kept=$keptTokens budget=${budget(l)} stock=$stock",
      )
    }
  }
}
