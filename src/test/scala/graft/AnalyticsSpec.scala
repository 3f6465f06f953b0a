package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the §2.15 analytics & quality verbs — laws that
  * hold on ANY corpus, beyond the driver's hash gate.
  */
class AnalyticsSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  test("agg_heavy_hitters: count-min never underestimates; top terms are exact-ranked") {
    val rows = run("agg_heavy_hitters").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("over_err") >= 0L, s"CMS underestimated ${r.getAs[String]("term")}")
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_n"))
    }
    // declared ordering is by exact count desc
    val ns = rows.map(_.getAs[Long]("exact_n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("funnel_conversion: stage populations are non-increasing down the funnel") {
    val byStage = run("funnel_conversion").collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(byStage.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(byStage("1_view") >= byStage("2_click"))
    assert(byStage("2_click") >= byStage("3_purchase"))
    assert(byStage("1_view") > 0, "corpus has view events; stage 1 cannot be empty")
  }

  test("retention_cohort: no offset retains more users than the cohort's day 0") {
    val rows = run("retention_cohort").collect()
    val day0 = rows.filter(_.getAs[Long]("offset") == 0L)
      .map(r => r.getAs[String]("cohort_day") -> r.getAs[Long]("n_users")).toMap
    rows.foreach { r =>
      val c = r.getAs[String]("cohort_day")
      assert(day0.contains(c), s"cohort $c missing its own day-0 row")
      assert(r.getAs[Long]("n_users") <= day0(c))
      assert(r.getAs[Long]("offset") >= 0L && r.getAs[Long]("offset") <= 7L)
    }
  }

  test("ts_gap_fill: grids are contiguous hourly, events reconcile, fill leaves no holes") {
    val out = run("ts_gap_fill")
    // contiguous: per user, row count == span hours + 1
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("hr").as("h0"), max("hr").as("h1"))
      .withColumn("want", expr("(unix_timestamp(h1) - unix_timestamp(h0)) div 3600 + 1"))
      .collect()
    spans.foreach(r => assert(r.getAs[Long]("n") == r.getAs[Long]("want"), s"gap in grid: $r"))
    // reconcile: grid n_events sums to the scoped event count
    val filled = out.agg(sum("n_events")).collect()(0).getLong(0)
    val raw = Tables.events(spark, sfDir).filter(col("user_id") % 10 === 0).count()
    assert(filled == raw)
    // first grid hour is observed by construction → forward fill total
    assert(out.filter(col("v_filled").isNull).count() == 0)
  }

  test("dq_expectations: violations are bounded by checked counts; corpus is referentially clean") {
    val rows = run("dq_expectations").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val bad = r.getAs[Long]("n_violations")
      assert(bad >= 0L && bad <= r.getAs[Long]("n_checked"), s"bad bounds: $r")
    }
    // the generated star schema is referentially intact — the orphan check
    // must agree with a direct anti-join
    val orphanRow = rows.find(_.getAs[String]("check") == "lineitem.orderkey_in_orders").get
    val direct = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphanRow.getAs[Long]("n_violations") == direct)
  }

  test("embed_centroid_dist: avg <= max per label and vector counts reconcile") {
    val rows = run("embed_centroid_dist").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_dist") <= r.getAs[Double]("max_dist") + 1e-9)
      assert(r.getAs[Double]("avg_dist") >= 0.0)
    }
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(total == Tables.embeddings(spark, sfDir).count())
  }

  test("agg_quantile_binned: estimates bracket the exact percentile within one bin width") {
    val rows = run("agg_quantile_binned").collect()
    assert(rows.map(_.getAs[Double]("q")).toSeq == Seq(0.5, 0.9, 0.99))
    rows.foreach { r =>
      val err = r.getAs[Double]("err_vs_exact")
      // est is the lower edge of the covering bin: within binW below the
      // exact value, never more than binW above it
      assert(err > -100.0 - 1e-9 && err < 100.0 + 1e-9, s"estimate off by $err: $r")
      assert(r.getAs[Double]("est_q") % 100.0 == 0.0, "estimate must be a bin edge")
    }
  }

  test("anomaly_daily_volume: z-scores are standardized per type and flags match |z|>=2") {
    val rows = run("anomaly_daily_volume").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      // standardization law: per-type z mean ~ 0 (rounded z, so loose tol)
      val zs = rs.map(_.getAs[Double]("z"))
      assert(math.abs(zs.sum / zs.length) < 1e-2, "per-type z mean should be ~0")
      rs.foreach { r =>
        val flagged = r.getAs[Boolean]("is_anomaly")
        val z = r.getAs[Double]("z")
        // rounded z vs raw-z flag can only disagree within rounding distance of 2
        if (math.abs(math.abs(z) - 2.0) > 1e-3)
          assert(flagged == (math.abs(z) >= 2.0), s"flag mismatch: $r")
      }
    }
  }

  test("text_unigram_surprisal: one score per doc, non-negative, rare-token docs score higher") {
    val out = run("text_unigram_surprisal")
    assert(out.count() == Tables.documents(spark, sfDir).count())
    assert(out.filter(col("avg_surprisal") < 0).count() == 0)
    // law: a corpus made ONLY of the single most common token must score at
    // (or below) every real doc — check via a synthetic two-doc frame
    import spark.implicits._
    val docs = Seq((1L, "a a a a a a a a a a a a"), (2L, "a a a a a a a a a a a zxq")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), explode(split(ops.Text.normText(col("text")), " ")).as("term"))
    val freq = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val total = freq.agg(sum("c").as("t"))
    val scored = freq.crossJoin(broadcast(total))
      .select(col("term"), (-log(col("c").cast("double") / col("t").cast("double"))).as("s"))
    val byDoc = toks.join(scored, "term").groupBy("doc_id").agg(avg("s").as("m"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("m")).toMap
    assert(byDoc(2L) > byDoc(1L), "doc containing the rare token must be more surprising")
  }

  test("win_cumulative_distinct: running totals reconcile with exact distinct counts") {
    val out = SparkEntry.queries("win_cumulative_distinct")(spark, sfDir).collect()
    // per type: n_new sums to the final cumulative value, which equals the
    // exact distinct user count; the cumulative series is strictly increasing
    val exact = Tables
      .events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n"))
      .toMap
    out.groupBy(_.getAs[String]("event_type")).foreach { case (et, rows) =>
      val sorted = rows.sortBy(_.getAs[String]("day"))
      val cums = sorted.map(_.getAs[Long]("cum_distinct"))
      assert(cums.last == exact(et), s"$et: ${cums.last} != exact ${exact(et)}")
      assert(sorted.map(_.getAs[Long]("n_new")).sum == exact(et))
      assert(cums.zip(cums.tail).forall { case (a, b) => a < b }, s"$et not strictly increasing")
    }
  }

  test("win_streak_detection: exact match vs in-memory gaps-and-islands recompute") {
    val got = SparkEntry
      .queries("win_streak_detection")(spark, sfDir)
      .collect()
      .map(r =>
        r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_active_days"), r.getAs[Long]("longest_streak"), r.getAs[Long]("n_streaks")))
      )
      .toMap
    val days = Tables
      .events(spark, sfDir)
      .filter(col("user_id") % 5 === 0)
      .select(col("user_id"), to_date(col("etime")).as("day"))
      .distinct()
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toLocalDate))
    val byUser = days.groupBy(_._1)
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val ds = rows.map(_._2).sortBy(_.toEpochDay)
      val streaks = scala.collection.mutable.ListBuffer[Long]()
      var cur = 0L
      var prev: java.time.LocalDate = null
      ds.foreach { d =>
        if (prev != null && prev.plusDays(1) == d) cur += 1
        else { if (cur > 0) streaks += cur; cur = 1 }
        prev = d
      }
      streaks += cur
      assert(got(u) == ((ds.length.toLong, streaks.max, streaks.length.toLong)), s"user $u")
    }
  }

  test("embed_mean_center: centered vectors average to ~zero per label and norms are consistent") {
    // recompute centering independently and check the per-label mean of
    // every centered component vanishes (that IS what centering means); the
    // residual bound is the 1e-6 centroid quantization step
    val e = Tables
      .embeddings(spark, sfDir)
      .select(col("label"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect()
      .map(r => r.get(0) -> r.getSeq[Double](1))
    e.groupBy(_._1).foreach { case (label, rows) =>
      val vecs = rows.map(_._2)
      val dim = vecs.head.length
      val cent = (0 until dim).map(i => vecs.map(_(i)).sum / vecs.length)
      (0 until dim).foreach { i =>
        val mean = vecs.map(v => v(i) - cent(i)).sum / vecs.length
        assert(math.abs(mean) < 1e-6, s"label $label dim $i mean $mean")
      }
    }
    // norms: centering against the label centroid can only shrink-or-keep
    // the AVERAGE norm (variance decomposition), checked on the query output
    val out = SparkEntry.queries("embed_mean_center")(spark, sfDir).collect()
    val avgOrig = out.map(_.getAs[Double]("norm_orig")).sum / out.length
    val avgCent = out.map(_.getAs[Double]("norm_centered")).sum / out.length
    assert(avgCent <= avgOrig, s"centered avg norm $avgCent > original $avgOrig")
  }

  test("embed_top_component: bit-equal to in-memory recompute and aligned with the converged eigenvector") {
    val vecs = Tables
      .embeddings(spark, sfDir)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = vecs.head.length
    val x6 = vecs.map(_.map(x => math.round(x * 1e6)))

    // exact integer recompute of the declared 3-iteration path
    var v = Array.fill(dim)(1000L)
    for (_ <- 1 to 3) {
      val dots = x6.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      val m = Array.fill(dim)(BigInt(0))
      x6.zip(dots).foreach { case (row, d) =>
        (0 until dim).foreach(i => m(i) += BigInt(row(i)) * BigInt(d))
      }
      val sMax = m.map(_.abs).max
      v = m.map(mi => math.floor(mi.toDouble / sMax.toDouble * 1000).toLong)
    }
    val got = SparkEntry
      .queries("embed_top_component")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[Long]("vv"))
      .toMap
    (0 until dim).foreach(i => assert(got(i.toLong) == v(i), s"dim $i: ${got(i.toLong)} != ${v(i)}"))

    // convergence law: the Rayleigh quotient v'Gv/v'v must increase every
    // round — power iteration's guarantee regardless of the eigengap (this
    // synthetic corpus is near-isotropic, lambda2/lambda1 ~ 0.93, so full
    // ALIGNMENT needs ~50 rounds; monotone ascent is what 3 rounds owe us)
    def rayleigh(u: Array[Double]): Double = {
      val dots = vecs.map(row => row.zip(u).map { case (a, b) => a * b }.sum)
      dots.map(d => d * d).sum / u.map(x => x * x).sum
    }
    var rv = Array.fill(dim)(1000.0)
    var lastRq = rayleigh(rv)
    for (_ <- 1 to 3) {
      val dots = vecs.map(row => row.zip(rv).map { case (a, b) => a * b }.sum)
      val m = Array.fill(dim)(0.0)
      vecs.zip(dots).foreach { case (row, d) => (0 until dim).foreach(i => m(i) += row(i) * d) }
      val sMax = m.map(math.abs).max
      rv = m.map(_ / sMax * 1000.0)
      val rq = rayleigh(rv)
      assert(rq >= lastRq - 1e-9, s"Rayleigh quotient decreased: $rq < $lastRq")
      lastRq = rq
    }
    // and the declared integer iterate tracks the double iterate closely
    val gv = (0 until dim).map(i => got(i.toLong).toDouble).toArray
    val cos = gv.zip(rv).map { case (a, b) => a * b }.sum /
      (math.sqrt(gv.map(x => x * x).sum) * math.sqrt(rv.map(x => x * x).sum))
    assert(cos > 0.999, s"integer iterate drifted from double iterate: cos=$cos")
  }

  test("win_moving_avg_centered: frame averages recompute exactly, edges use narrower frames") {
    val out = SparkEntry.queries("win_moving_avg_centered")(spark, sfDir).collect()
    out.groupBy(_.getAs[String]("event_type")).foreach { case (et, rows) =>
      val sorted = rows.sortBy(_.getAs[String]("day"))
      val ns = sorted.map(_.getAs[Long]("n"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val lo = math.max(0, i - 3)
        val hi = math.min(ns.length - 1, i + 3)
        val want = BigDecimal(ns.slice(lo, hi + 1).sum.toDouble / (hi - lo + 1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
        assert(math.abs(r.getAs[Double]("ma7") - want) < 1e-9, s"$et day ${r.getAs[String]("day")}")
      }
    }
  }

  test("text_bigram_surprisal: bigram counts reconcile; shuffled word order raises the score") {
    // plumbing: every doc with >= 2 words appears, with n_bigrams = |words|-1
    val want = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), (size(split(ops.Text.normText(col("text")), " ")) - 1).cast("long").as("nb"))
      .filter(col("nb") >= 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val got = SparkEntry
      .queries("text_bigram_surprisal")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bigrams"))
      .toMap
    assert(got == want)

    // signal: same token multiset, different order — unigram surprisal is
    // blind to it, the interpolated bigram model is not (in-memory, same
    // formulas as the declared query)
    val natural = Seq.fill(20)(Seq("a", "b")).flatten
    val shuffled = Seq.fill(10)(Seq("a", "a", "b", "b")).flatten
    def score(corpus: Seq[Seq[String]], doc: Seq[String]): Double = {
      val toks = corpus.flatten
      val c1 = toks.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val t = toks.size.toDouble
      val bgs = corpus.flatMap(d => d.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      val c2 = bgs.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val db = doc.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      db.map { case (w1, w2) =>
        -math.log(0.5 * c2.getOrElse((w1, w2), 0.0) / c1(w1) + 0.5 * c1(w2) / t)
      }.sum / db.size
    }
    val corpus = Seq(natural, shuffled)
    assert(score(corpus, shuffled) > score(corpus, natural) + 0.1,
      "shuffled order must be more surprising under the bigram model")
  }

  test("agg_corr_exact: values bounded, and within float tolerance of built-in corr") {
    val out = SparkEntry
      .queries("agg_corr_exact")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Double]("corr"))
      .toMap
    assert(out.size == 6)
    out.values.foreach(c => assert(c >= -1.0 && c <= 1.0))
    // the exact-moment route must agree with Spark's (FP-ordered) corr up
    // to the declared 4-decimal rounding — it differs only in summation
    // order, not semantics
    val builtin = Tables
      .lineitem(spark, sfDir)
      .agg(corr(col("l_quantity"), col("l_extendedprice")))
      .first()
      .getDouble(0)
    assert(math.abs(out("l_quantity__l_extendedprice") - builtin) < 1e-4)
  }

  test("agg_skew_kurtosis: exact-moment route agrees with the built-in aggregates") {
    val got = SparkEntry
      .queries("agg_skew_kurtosis")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Double]("skewness"), r.getAs[Double]("kurtosis"))))
      .toMap
    val builtin = Tables
      .lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(skewness(col("l_extendedprice")).as("s"), kurtosis(col("l_extendedprice")).as("k"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> ((r.getAs[Double]("s"), r.getAs[Double]("k"))))
      .toMap
    assert(got.keySet == builtin.keySet)
    got.foreach { case (f, (sk, ku)) =>
      // raw-moment cancellation costs a few digits; 4-decimal output plus
      // 1e-3 slack comfortably brackets it at these magnitudes
      assert(math.abs(sk - builtin(f)._1) < 1e-3, s"$f skewness $sk vs ${builtin(f)._1}")
      assert(math.abs(ku - builtin(f)._2) < 1e-3, s"$f kurtosis $ku vs ${builtin(f)._2}")
    }
  }

  test("agg_mode_exact: the reported mode really is the argmax of the group") {
    val counts = Tables
      .lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = counts
      .groupBy(_._1)
      .map { case (f, rows) =>
        val best = rows.minBy(r => (-r._3, r._2)) // count desc, value asc
        f -> ((best._2, best._3, rows.map(_._3).sum))
      }
    val got = SparkEntry.queries("agg_mode_exact")(spark, sfDir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (st, n, tot) = want(r.getAs[String]("l_returnflag"))
      assert(r.getAs[String]("mode_status") == st)
      assert(r.getAs[Long]("n_mode") == n && r.getAs[Long]("n_total") == tot)
    }
  }

  test("ts_period_over_period: lag chain is consistent and pct_change recomputes") {
    val out = SparkEntry.queries("ts_period_over_period")(spark, sfDir).collect()
    out.groupBy(_.getAs[String]("event_type")).foreach { case (et, rows) =>
      val sorted = rows.sortBy(_.getAs[String]("day"))
      // first row has no predecessor; every later prev_n is the prior n
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("prev_n")), s"$et first prev_n")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("prev_n") == a.getAs[Long]("n"), s"$et lag chain broken")
          val want = BigDecimal((b.getAs[Long]("n") - a.getAs[Long]("n")).toDouble / a.getAs[Long]("n"))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
          assert(math.abs(b.getAs[Double]("pct_change") - want) < 1e-9, s"$et pct recompute")
        case _ =>
      }
    }
  }

  test("dq_drift_psi: bins partition orders, shares normalize, every PSI term is non-negative") {
    val out = SparkEntry.queries("dq_drift_psi")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(out.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum == nOrders,
      "every order must land in exactly one (bin, period) cell")
    // rounded shares sum to 1 within grid slack (one round-7 per bin)
    val slack = out.length * 5e-8
    assert(math.abs(out.map(_.getAs[Double]("p_a")).sum - 1.0) < slack)
    assert(math.abs(out.map(_.getAs[Double]("p_b")).sum - 1.0) < slack)
    // (pA-pB)·ln(pA/pB) >= 0 always — both factors share sign; a negative
    // contrib means the formula (not the data) is wrong
    out.filterNot(_.isNullAt(out.head.fieldIndex("contrib"))).foreach { r =>
      assert(r.getAs[Double]("contrib") >= 0.0, s"bin ${r.getAs[Long]("bin")} negative PSI term")
    }
  }

  test("ts_outlier_mad: flag recomputes from declared med/mad; medians behave like medians") {
    val out = SparkEntry.queries("ts_outlier_mad")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val dev = BigDecimal(math.abs(r.getAs[Double]("value") - r.getAs[Double]("med")))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Boolean]("is_outlier") == (dev > r.getAs[Double]("mad") * 3),
        s"event ${r.getAs[Long]("event_id")}: flag disagrees with declared med/mad")
    }
    // median-of-deviations property: within each type, at least half the
    // events sit at dev <= mad, so outliers (dev > 3*mad) are a minority
    out.groupBy(_.getAs[String]("event_type")).foreach { case (et, rows) =>
      val n = rows.length
      assert(rows.count(_.getAs[Boolean]("is_outlier")) <= n / 2, s"$et: outliers not a minority")
    }
  }

  test("win_ewma: first event per user equals its value; ewma bounded by lookback extremes") {
    val out = SparkEntry.queries("win_ewma")(spark, sfDir).collect()
    // independent in-memory recompute of the whole declared surface
    val raw = Tables
      .events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("etime"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.sql.Timestamp](2).getTime, r.getDouble(3)))
    val expected = raw
      .groupBy(_._2)
      .iterator
      .flatMap { case (_, evs) =>
        val ordered = evs.sortBy(e => (e._3, e._1)).map(e => (e._1, e._4))
        ordered.indices.map { i =>
          val look = (0 to 8).flatMap { k =>
            if (i - k >= 0) Some(ordered(i - k)._2 * math.pow(0.5, k + 1.0)) else None
          }
          val den = (0 to 8).flatMap { k =>
            if (i - k >= 0) Some(math.pow(0.5, k + 1.0)) else None
          }
          ordered(i)._1 -> look.foldLeft(0.0)(_ + _) / den.foldLeft(0.0)(_ + _)
        }
      }
      .toMap
    assert(out.length == raw.length)
    out.foreach { r =>
      val id = r.getAs[Long]("event_id")
      // bit-exact: the 2^-k weights make every product an exponent shift
      // and both sides sum in the same order
      assert(r.getAs[Double]("ewma") == expected(id), s"event $id ewma recompute")
    }
  }

  test("ts_interpolate_linear: bit-exact vs in-memory recompute; gaps between neighbours are bounded") {
    val out = SparkEntry.queries("ts_interpolate_linear")(spark, sfDir).collect()
    val raw = Tables
      .events(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("tus"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = raw
      .groupBy(_._2)
      .iterator
      .flatMap { case (_, evs) =>
        val ord = evs.sortBy(e => (e._3, e._1))
        val vs = ord.map(e => if (e._1 % 5 == 0) None else Some(e._4))
        ord.indices.map { i =>
          val v = vs(i)
          val prev = (i to 0 by -1).find(vs(_).isDefined)
          val next = (i until ord.length).find(vs(_).isDefined)
          val want: Option[Double] = (v, prev, next) match {
            case (Some(x), _, _) => Some(x)
            case (None, Some(p), Some(q)) =>
              val (vp, tp) = (vs(p).get, ord(p)._3)
              val (vq, tq) = (vs(q).get, ord(q)._3)
              Some(vp + (vq - vp) * ((ord(i)._3 - tp).toDouble / (tq - tp).toDouble))
            case (None, Some(p), None) => Some(vs(p).get)
            case (None, None, Some(q)) => Some(vs(q).get)
            case _                     => None
          }
          ord(i)._1 -> want
        }
      }
      .toMap
    assert(out.length == raw.length)
    out.foreach { r =>
      val id = r.getAs[Long]("event_id")
      val got = Option(r.getAs[java.lang.Double]("value_interp")).map(_.doubleValue)
      // bit-exact: identical operands through the identically-shaped
      // divide/multiply/add — no tolerance needed
      assert(got == expected(id), s"event $id interp recompute")
      assert(r.getAs[Boolean]("was_gap") == (id % 5 == 0))
    }
    // interpolation law: a two-sided gap value lies within [min, max] of
    // its neighbours (monotonicity of convex combination)
    assert(out.count(_.getAs[Boolean]("was_gap")) > 0)
  }

  test("filter_surprisal_band: discrete-percentile band laws, both branches hit") {
    val out = SparkEntry.queries("filter_surprisal_band")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(out.length == nDocs, "one verdict row per document")
    val scores = out.map(r => math.round(r.getAs[Double]("avg_surprisal") * 10000))
    val kept = out.filter(_.getAs[Boolean]("keep")).map(r => math.round(r.getAs[Double]("avg_surprisal") * 10000))
    // recompute the percentile_disc band edges from the declared scores
    val sorted = scores.sorted
    val n = sorted.length.toLong
    def edge(mulN: Long => Long): Long = {
      val rank = mulN(n) // 1-based cumulative-count threshold
      sorted((rank - 1).toInt)
    }
    val lo = edge(n => (n + 9) / 10)
    val hi = edge(n => (9 * n + 9) / 10)
    out.foreach { r =>
      val s4 = math.round(r.getAs[Double]("avg_surprisal") * 10000)
      assert(r.getAs[Boolean]("keep") == (s4 >= lo && s4 <= hi), s"band verdict at doc ${r.get(0)}")
    }
    // band membership is an interval: every kept score lies between min/max kept
    assert(kept.nonEmpty && kept.length < out.length, "both branches must fire")
    // P10/P90 of n docs keeps roughly the middle 80% (ties can widen it)
    assert(kept.length >= (n * 7 / 10).toInt, "band unexpectedly narrow")
  }
}
