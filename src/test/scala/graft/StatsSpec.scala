package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 statistical-modeling verbs — laws
  * that hold on ANY corpus, cross-checked against independent in-memory
  * recomputations (BigInt/exact arithmetic, no Spark) so a plan bug and a
  * math bug cannot cancel.
  */
class StatsSpec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfDir)

  /** Daily (event_type, day, count) recomputed independently of the ops. */
  private lazy val dailyRef: Map[String, Seq[Long]] =
    Tables
      .events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("etime")).as("day"))
      .agg(count(lit(1)).as("c"))
      .orderBy("event_type", "day")
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("c")))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSeq)
      .toMap

  test("stats_linreg_trend: matches exact BigInt OLS recomputed from daily counts") {
    val rows = run("stats_linreg_trend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cs = dailyRef(r.getAs[String]("event_type"))
      val n = BigInt(cs.length)
      val ks = (1 to cs.length).map(BigInt(_))
      val sk = ks.sum; val sc = cs.map(BigInt(_)).sum
      val skc = ks.zip(cs).map { case (k, c) => k * c }.sum
      val sk2 = ks.map(k => k * k).sum
      val slope = (n * skc - sk * sc).toDouble / (n * sk2 - sk * sk).toDouble
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-6, r.toString)
      assert(r.getAs[Long]("n_days") == cs.length)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("stats_chi2_terms: chi2 is label-complement invariant and matches the 2x2 formula") {
    val rows = run("stats_chi2_terms").collect()
    assert(rows.nonEmpty)
    // global label counts recomputed independently
    val docs = Tables.documents(spark, sfDir).select("lang").collect()
    val nTot = BigInt(docs.length)
    val kPos = BigInt(docs.count(_.getAs[String]("lang") == "en"))
    rows.foreach { r =>
      val nT = BigInt(r.getAs[Long]("n_docs")); val a = BigInt(r.getAs[Long]("n_pos"))
      // recompute chi2 from the published cells
      val d2 = a * (nTot - kPos - nT + a) - (nT - a) * (kPos - a)
      val num = nTot * d2 * d2
      val den = nT * (nTot - nT) * kPos * (nTot - kPos)
      val want = num.toDouble / den.toDouble
      assert(math.abs(r.getAs[Double]("chi2") - want) < 1e-6, r.toString)
      // complement invariance: swapping the label (a -> n_t - a, k -> n - k)
      // leaves (ad - bc)^2 and the margin product unchanged
      val aC = nT - a
      val d2C = aC * (nTot - (nTot - kPos) - nT + aC) - (nT - aC) * ((nTot - kPos) - aC)
      assert(d2C * d2C == d2 * d2, s"chi2 not label-symmetric for ${r.getAs[String]("term")}")
    }
  }

  test("win_rolling_median: frame is 7-row bounded, median sits inside [mn, mx]") {
    val rows = run("win_rolling_median").collect()
    assert(rows.nonEmpty)
    var lastType = ""
    var seen = 0
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      if (t != lastType) { lastType = t; seen = 0 }
      seen += 1
      val nWin = r.getAs[Long]("n_win")
      assert(nWin == math.min(seen, 7).toLong, s"window size drifted at $r")
      val mn = r.getAs[Long]("mn"); val mx = r.getAs[Long]("mx")
      val med = r.getAs[Double]("med")
      assert(mn <= mx && med >= mn.toDouble && med <= mx.toDouble)
      // first row of each series: all three collapse onto the day's count
      if (nWin == 1) assert(mn == r.getAs[Long]("c") && med == mn.toDouble)
    }
  }

  test("ts_cross_corr: r in [-1,1]; lag-0 matches in-memory Pearson on the daily series") {
    val rows = run("ts_cross_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("r")) <= 1.0 + 1e-9)
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
    }
    rows.filter(_.getAs[Long]("lag") == 0L).foreach { r =>
      val xs = dailyRef(r.getAs[String]("type_a")).map(_.toDouble)
      val ys = dailyRef(r.getAs[String]("type_b")).map(_.toDouble)
      // the fixture's series are aligned (same 30 days per type); if a day
      // were missing on one side the query's inner join would drop it and
      // n_days would flag the difference
      assert(r.getAs[Long]("n_days") == math.min(xs.length, ys.length).toLong)
      val n = xs.length
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      val vy = ys.map(y => (y - my) * (y - my)).sum
      val want = cov / math.sqrt(vx * vy)
      assert(math.abs(r.getAs[Double]("r") - want) < 1e-6, r.toString)
    }
  }

  test("tokenizer_bpe_pairs: matches in-memory BPE pair counts over the vocab") {
    val rows = run("tokenizer_bpe_pairs").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    // independent recompute: word frequencies then within-word pair counts
    val texts = Tables.documents(spark, sfDir).select("text").collect().map(_.getString(0))
    val wf = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      t.toLowerCase.trim.split("\\s+").filter(_.length >= 2).foreach { w =>
        wf.update(w, wf.getOrElse(w, 0L) + 1L)
      }
    }
    val occ = scala.collection.mutable.Map.empty[String, Long]
    val words = scala.collection.mutable.Map.empty[String, Set[String]]
    wf.foreach { case (w, f) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        occ.update(p, occ.getOrElse(p, 0L) + f)
        words.update(p, words.getOrElse(p, Set.empty) + w)
      }
    }
    val wantTop = occ.toSeq.sortBy { case (p, n) => (-n, p) }.take(rows.length)
    rows.zip(wantTop).foreach { case (r, (p, n)) =>
      assert(r.getAs[String]("pair") == p && r.getAs[Long]("n_occ") == n, r.toString)
      assert(r.getAs[Long]("n_words") == words(p).size.toLong)
      assert(r.getAs[String]("pair").length == 2)
    }
  }

  test("dq_benford: digits 1-9 partition positive orders; benford ppm sums to ~1e6") {
    val rows = run("dq_benford").collect()
    val digits = rows.map(_.getAs[Long]("digit"))
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(digits.distinct.length == digits.length)
    val nPos = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nPos)
    // hard-coded expectation table is a probability distribution in ppm
    assert(math.abs(Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L).sum - 1000000L) <= 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_ppm") == r.getAs[Long]("share_ppm") - r.getAs[Long]("benford_ppm"))
    }
  }
}
